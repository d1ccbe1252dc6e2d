"""Data layer: audio IO, segmentation, contextual examples, frame packing,
datasets & bucketed batching.

Capability equivalent of src/csm/data/training_data.py (SURVEY.md §2.4).
"""

from csm_tpu.data.audio import load_audio, load_wav, resample, save_wav
from csm_tpu.data.dataset import (
    CSMDataset,
    LENGTH_BUCKETS,
    batch_iterator,
    bucket_for,
    collate,
)
from csm_tpu.data.frames import audio_frames, concat_frames, segment_frames, text_frames
from csm_tpu.data.processor import (
    ContextualExampleGenerator,
    CSMDataProcessor,
    TrainingExample,
)
from csm_tpu.data.tokenizers import (
    ByteTokenizer,
    LlamaTokenizer,
    MimiAudioTokenizer,
    load_text_tokenizer,
)

__all__ = [
    "load_audio",
    "load_wav",
    "resample",
    "save_wav",
    "CSMDataset",
    "LENGTH_BUCKETS",
    "batch_iterator",
    "bucket_for",
    "collate",
    "audio_frames",
    "concat_frames",
    "segment_frames",
    "text_frames",
    "ContextualExampleGenerator",
    "CSMDataProcessor",
    "TrainingExample",
    "ByteTokenizer",
    "LlamaTokenizer",
    "MimiAudioTokenizer",
    "load_text_tokenizer",
]
