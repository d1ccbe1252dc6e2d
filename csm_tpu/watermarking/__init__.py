"""Audio watermarking (SilentCipher-equivalent, JAX).

Capability equivalent of src/csm/watermarking/ (SURVEY.md §2.3): STFT-
domain additive watermark with gated-conv encoder/decoder CNNs, 5-byte
message payload, phase-shift-robust decoding, and the public CSM key.
"""

from csm_tpu.watermarking.watermarker import (
    CSM_1B_GH_WATERMARK,
    Watermarker,
    check_audio_from_file,
    load_watermarker,
    verify,
    watermark,
)

__all__ = [
    "CSM_1B_GH_WATERMARK",
    "Watermarker",
    "check_audio_from_file",
    "load_watermarker",
    "verify",
    "watermark",
]
