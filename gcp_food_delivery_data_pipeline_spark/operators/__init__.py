"""Engine operators: reference-parity transforms plus the training-data
pipeline extensions (dedup, similarity, text analysis, multimodal)."""
