"""Example-script smoke tests (library-API LoRA variants).

Drives the tiny paths of examples/lora_finetuning/*.py end-to-end —
the python equivalents of the reference's examples/lora_finetuning/
scenario scripts (basic / low-resource / style-transfer /
multi-speaker). Each run covers data prep -> trainer -> save -> sample
with tiny random weights on synthetic audio, so the recipes stay
import-clean and runnable as the library API evolves.
"""

import json
import sys

import numpy as np
import pytest

from csm_tpu.data.audio import load_wav, save_wav

# ~1-2 min/script (train + sample compiles); the CLI tiny tests cover
# the same trainer paths in the fast loop
pytestmark = pytest.mark.slow

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from examples.lora_finetuning import (  # noqa: E402
    basic_lora,
    low_resource_lora,
    multi_speaker_lora,
    style_transfer_lora,
)


def make_training_dir(tmp_path, n=2, seconds=2.0, speaker_dir="data"):
    d = tmp_path / speaker_dir
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(int(seconds * 24_000)) / 24_000
        audio = (0.1 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        save_wav(str(d / f"utt{i}.wav"), audio, 24_000)
        (d / f"utt{i}.txt").write_text(f"this is test utterance number {i} okay")
    return str(d)


@pytest.mark.parametrize("script,sample", [
    (basic_lora, "sample.wav"),
    (low_resource_lora, "sample.wav"),
    (style_transfer_lora, "style_sample_0.wav"),
])
def test_single_voice_examples_tiny(tmp_path, script, sample):
    data = make_training_dir(tmp_path)
    out = str(tmp_path / "out")
    script.main(data, out_dir=out, tiny_test=True)
    audio, sr = load_wav(f"{out}/{sample}")
    assert sr == 24_000 and audio.size > 0


def test_multi_speaker_example_tiny(tmp_path):
    cfg = [
        {"name": "alice", "speaker_id": 0,
         "audio_dir": make_training_dir(tmp_path, speaker_dir="sp0")},
        {"name": "bob", "speaker_id": 1,
         "audio_dir": make_training_dir(tmp_path, speaker_dir="sp1")},
    ]
    cfg_path = tmp_path / "speakers.json"
    cfg_path.write_text(json.dumps(cfg))
    out = str(tmp_path / "ms_out")
    multi_speaker_lora.main(str(cfg_path), out_dir=out, tiny_test=True)
    import os

    for sid in (0, 1):
        assert os.path.exists(
            f"{out}/speaker_{sid}/adapter/lora_metadata.json")
