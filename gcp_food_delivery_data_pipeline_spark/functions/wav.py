"""Real WAV (RIFF/PCM) audio codec on the stdlib only.

The audio counterpart of ``functions.png``: WAV is RIFF chunk framing
around raw PCM frames, fully handled by the stdlib ``wave`` module, so
the multimodal audio path can run a genuine container codec end-to-end
— no fake byte-slicing. Mono 16-bit little-endian PCM is the
implemented subset; other sample widths / channel counts raise
``NotImplementedError`` with the subset spelled out.

Same scale contract as the PNG path: encode/decode run inside
Arrow-batched ``mapInPandas`` (see
``operators.multimodal.decode_wav_stats``), payloads never cross a
shuffle, and swapping this for a C codec (libsndfile) changes one
function body, not the plan.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav_pcm16(
    samples: list[int] | bytes, sample_rate: int = 16000
) -> bytes:
    """Encode mono 16-bit PCM samples as a standards-compliant WAV.

    ``samples`` is a sequence of ints in [-32768, 32767] (or raw
    little-endian int16 bytes). Any WAV reader opens the result.
    """
    if isinstance(samples, (bytes, bytearray)):
        frames = bytes(samples)
        if len(frames) % 2:
            raise ValueError("raw PCM16 byte buffer must have even length")
    else:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a mono 16-bit PCM WAV produced by any standards-compliant
    writer. Returns ``(sample_rate, n_samples, samples)``.
    """
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            frames = w.readframes(n)
    except wave.Error as exc:
        raise ValueError(f"not a readable WAV: {exc}") from exc
    if (nch, width) != (1, 2):
        raise NotImplementedError(
            "only mono 16-bit PCM is implemented; got "
            f"channels={nch} sample_width={width}"
        )
    if len(frames) != 2 * n:
        raise ValueError(
            f"truncated data chunk: header declares {n} frames "
            f"({2 * n} bytes), got {len(frames)} bytes"
        )
    samples = list(struct.unpack(f"<{n}h", frames))
    return rate, n, samples
