"""Shared CLI helpers."""

from __future__ import annotations

import argparse


def enable_compile_cache():
    """Persistent XLA compile cache for every CLI: first CSM-1B compile is
    minutes, cached reruns are seconds.  Honors a user-set
    JAX_COMPILATION_CACHE_DIR; defaults under the user cache dir."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "csm_tpu", "jax_cache",
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except OSError:
        pass  # read-only home: run uncached

    # Tunneled-TPU rigs: pay the relay's first-fetch stall on a background
    # thread, overlapped with model load/compile, instead of mid-generation
    # (csm_tpu/utils/transport.py).
    from csm_tpu.utils.transport import warm_transport_async

    warm_transport_async(verbose=bool(os.environ.get("CSM_TPU_DEBUG")))


# Voice presets — part of the reference's user-facing API
# (src/csm/cli/generate.py:14-25): named voices mapped to speaker IDs.
VOICE_PRESETS = {
    "neutral": 0,
    "warm": 1,
    "deep": 2,
    "bright": 3,
    "soft": 4,
    "energetic": 5,
    "calm": 6,
    "clear": 7,
    "resonant": 8,
    "authoritative": 9,
}


def add_voice_args(parser: argparse.ArgumentParser):
    g = parser.add_mutually_exclusive_group()
    g.add_argument("--speaker", type=int, default=0, help="Speaker ID (default: 0)")
    g.add_argument(
        "--voice",
        type=str,
        choices=sorted(VOICE_PRESETS),
        help="Voice preset name",
    )
    return parser


def resolve_speaker(args) -> int:
    if getattr(args, "voice", None):
        sid = VOICE_PRESETS[args.voice]
        print(f"Using voice preset '{args.voice}' (speaker ID: {sid})")
        return sid
    return args.speaker


def add_parallel_args(parser: argparse.ArgumentParser):
    """Parallelism flags shared by csm-train / csm-finetune-lora[-multi]
    (mesh over the attached devices; see docs/architecture.md)."""
    g = parser.add_argument_group("Parallelism")
    g.add_argument("--model-parallel", type=int, default=1,
                   help="Tensor-parallel axis size (Megatron-style TP)")
    g.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style weight sharding over the data axis")
    g.add_argument("--pipeline-parallel", type=int, default=1,
                   help="Pipeline stages over a pipe axis (8B memory "
                        "lever; exclusive with --model-parallel/--fsdp)")
    g.add_argument("--seq-parallel", type=int, default=1,
                   help="Sequence-parallel (ring attention) axis size for "
                        "long-context training; the sequence length must "
                        "be a multiple of it")
    g.add_argument("--ring-layout", choices=("auto", "zigzag", "contiguous"),
                   default="auto",
                   help="Ring-attention sequence layout: zigzag balances "
                        "causal work per device (auto = zigzag when the "
                        "sequence divides by 2*seq-parallel); identical "
                        "results either way")
    g.add_argument("--pp-microbatches", type=int, default=1,
                   help="Microbatches per step in pipeline mode (bubble "
                        "fraction = (P-1)/(M+P-1))")
    g.add_argument("--distributed", action="store_true",
                   help="Join a multi-host run (jax.distributed; on TPU "
                        "pods topology is auto-detected)")
    return parser


def add_tiny_test_flag(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--tiny-test",
        action="store_true",
        help="Use a tiny random-weight model + codec (no checkpoints needed; "
        "for smoke testing in offline environments)",
    )
    parser.add_argument(
        "--allow-byte-tokenizer",
        action="store_true",
        help="Permit the degraded byte-level text tokenizer when the HF "
        "Llama-3.2 tokenizer is not in the local cache (loud warning; "
        "real-weight generation will be garbage without the real tokenizer)",
    )
    return parser


def build_generator(args, compute_dtype=None):
    """Construct a Generator from CLI args (full CSM-1B or tiny fixture)."""
    import os

    import jax.numpy as jnp

    from csm_tpu.generator import Generator, load_csm_1b

    if getattr(args, "allow_byte_tokenizer", False):
        os.environ["CSM_TPU_ALLOW_BYTE_TOKENIZER"] = "1"

    dtype = compute_dtype or jnp.bfloat16
    if getattr(args, "tiny_test", False):
        import jax

        from csm_tpu.codec.mimi import MimiConfig, mimi_init
        from csm_tpu.codec.transformer import MimiTransformerConfig
        from csm_tpu.data.tokenizers import ByteTokenizer, MimiAudioTokenizer
        from csm_tpu.models.config import tiny_test_args
        from csm_tpu.models.csm import init_csm_params

        margs = tiny_test_args()
        params = init_csm_params(jax.random.key(0), margs, jnp.float32)
        mcfg = MimiConfig(
            num_quantizers=margs.audio_num_codebooks,
            codebook_size=margs.audio_vocab_size - 3,
            transformer=MimiTransformerConfig(num_layers=1),
        )
        mimi = MimiAudioTokenizer(mimi_init(jax.random.key(1), mcfg), cfg=mcfg)
        return Generator(
            params, margs, mimi=mimi, text_tokenizer=ByteTokenizer(),
            compute_dtype=jnp.float32,
        )
    margs = None
    flavor = getattr(args, "flavor", "1b")
    qmode = ("int4" if getattr(args, "int4", False)
             else "int8" if getattr(args, "int8", False)
             else "int8-decoder" if getattr(args, "int8_decoder", False)
             else "none")
    if flavor == "tiny":
        from csm_tpu.models.config import tiny_file_args

        margs = tiny_file_args()
    elif flavor == "8b":
        # the original CSM's internal scale (8B backbone + 300M-class
        # decoder, reference docs/reference/sesame_csm/components.md:8-10);
        # loads leaf-streamed + quantized — csm-serve's --weight-dtype
        # selects the mode when the --int8/--int4 flags aren't present
        from csm_tpu.models.config import csm_8b_args

        margs = csm_8b_args()
        if qmode == "none":
            wd = getattr(args, "weight_dtype", None)
            qmode = {"int8": "int8", "int4": "int4", "auto": "int8"}.get(wd, qmode)
    return load_csm_1b(
        getattr(args, "model_path", None),
        mimi_path=getattr(args, "mimi_path", None),
        compute_dtype=dtype,
        quantize=qmode,
        kv_int8=getattr(args, "kv_int8", False),
        args=margs,
        lora_path=getattr(args, "lora_path", None),
    )
