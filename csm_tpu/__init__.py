"""csm-tpu — TPU-native (JAX/XLA/Pallas) rebuild of CSM.

The Sesame Conversational Speech Model re-designed for TPU: a Llama-3.2-1B
backbone + 100M audio decoder over interleaved text + Mimi RVQ tokens,
with the full generation loop compiled to one XLA program, a JAX Mimi
codec, SilentCipher-equivalent watermarking, optax training with the
compute-amortized decoder loss, LoRA fine-tuning, and (data, model) mesh
sharding.  Public surface mirrors the reference (src/csm): Segment,
Generator, load_csm_1b, trainers, and the csm-* CLIs.
"""

__version__ = "0.1.0"

from csm_tpu.generator import Generator, PackedContext, Segment, load_csm_1b
from csm_tpu.models.config import ModelArgs, TransformerConfig, csm_1b_args

__all__ = [
    "Generator",
    "PackedContext",
    "Segment",
    "load_csm_1b",
    "ModelArgs",
    "TransformerConfig",
    "csm_1b_args",
    "__version__",
]
