"""``csm-verify`` — watermark verification CLI
(capability equivalent of src/csm/cli/verify.py)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    from csm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="Check audio for the CSM watermark")
    p.add_argument("audio_path", type=str)
    p.add_argument("--watermark-ckpt", type=str, default=None,
                   help="Directory with silentcipher torch checkpoints")
    args = p.parse_args(argv)

    from csm_tpu.watermarking import check_audio_from_file

    is_marked = check_audio_from_file(args.audio_path, args.watermark_ckpt)
    return 0 if is_marked else 1


if __name__ == "__main__":
    sys.exit(main())
