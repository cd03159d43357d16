"""Structured Streaming mode — replaces the reference's Airflow sensor +
file-move + Dataflow-launch orchestration (SURVEY.md §2.5)."""
