"""Data layer tests: audio IO, segmentation, contextual examples, frame
packing, dataset & bucketed collation.

Mirrors the reference's synthetic-fixture strategy (SURVEY.md §4: sine
waves + canned sentences + word-alignment JSONs,
tests/create_test_model.py:303-399) with mock tokenizers
(src/csm/training/test_training.py:20-46).
"""

import json
import os

import numpy as np
import pytest

from csm_tpu.data import (
    ByteTokenizer,
    CSMDataProcessor,
    CSMDataset,
    ContextualExampleGenerator,
    TrainingExample,
    audio_frames,
    batch_iterator,
    bucket_for,
    collate,
    load_wav,
    resample,
    save_wav,
    segment_frames,
    text_frames,
)
from csm_tpu.models.config import tiny_test_args


class FakeAudioTokenizer:
    """12.5 Hz constant-rate fake Mimi (analogue of the reference's mock
    audio tokenizer, src/csm/training/test_training.py:20-46)."""

    def __init__(self, K=4, sample_rate=24_000):
        self.K = K
        self.sample_rate = sample_rate

    def encode(self, audio):
        F = max(1, int(len(audio) / self.sample_rate * 12.5))
        rng = np.random.default_rng(len(audio) % 7919)
        return rng.integers(1, 60, (self.K, F)).astype(np.int32)


def sine(seconds, sr=24_000, hz=440.0):
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


# ---- audio IO ----


def test_wav_roundtrip(tmp_path):
    x = sine(0.25)
    p = str(tmp_path / "a.wav")
    save_wav(p, x, 24_000)
    y, sr = load_wav(p)
    assert sr == 24_000
    np.testing.assert_allclose(x, y, atol=1e-3)


def test_resample_length():
    x = sine(1.0, sr=48_000)
    y = resample(x, 48_000, 24_000)
    assert abs(len(y) - 24_000) <= 1


# ---- segmentation ----


def test_char_segmentation(tmp_path):
    proc = CSMDataProcessor(segment_duration=10.0, overlap_duration=2.0)
    audio_p, text_p = str(tmp_path / "x.wav"), str(tmp_path / "x.txt")
    save_wav(audio_p, sine(25.0), 24_000)
    with open(text_p, "w") as f:
        f.write("word " * 120)
    exs = proc.prepare_from_audio_file(audio_p, text_p, speaker_id=3)
    assert len(exs) >= 2
    for ex in exs:
        assert len(ex.text) >= 10
        assert len(ex.audio) >= 24_000
        assert ex.speaker_id == 3
        assert len(ex.audio) <= 10.0 * 24_000 + 1


def test_short_audio_single_segment(tmp_path):
    proc = CSMDataProcessor()
    audio_p, text_p = str(tmp_path / "s.wav"), str(tmp_path / "s.txt")
    save_wav(audio_p, sine(3.0), 24_000)
    with open(text_p, "w") as f:
        f.write("a short test sentence")
    exs = proc.prepare_from_audio_file(audio_p, text_p, speaker_id=0)
    assert len(exs) == 1
    assert exs[0].text == "a short test sentence"


def test_alignment_segmentation(tmp_path):
    proc = CSMDataProcessor(segment_duration=4.0, overlap_duration=1.0)
    audio_p, text_p = str(tmp_path / "w.wav"), str(tmp_path / "w.txt")
    align_p = str(tmp_path / "w.json")
    save_wav(audio_p, sine(10.0), 24_000)
    words = [
        {"word": f"w{i}", "start": i * 0.5, "end": i * 0.5 + 0.45}
        for i in range(20)
    ]
    with open(text_p, "w") as f:
        f.write(" ".join(w["word"] for w in words))
    with open(align_p, "w") as f:
        json.dump({"words": words}, f)
    exs = proc.prepare_from_audio_file(audio_p, text_p, 1, alignment_path=align_p)
    assert len(exs) >= 2
    for ex in exs:
        assert len(ex.audio) <= 4.0 * 24_000 + 1
        assert ex.text.startswith("w")


def test_contextual_examples():
    conv = [
        TrainingExample(f"turn {i}", sine(1.0), i % 2) for i in range(5)
    ]
    gen = ContextualExampleGenerator(max_context_turns=2)
    exs = gen.create_contextual_examples(conv)
    assert len(exs) == 5
    assert exs[0]["context"] == []
    assert len(exs[4]["context"]) == 2
    assert exs[4]["target"].text == "turn 4"
    assert [e.text for e in exs[4]["context"]] == ["turn 2", "turn 3"]


def test_conversational_examples_never_cross_files():
    """--conversational contract (reference csm-train-mlx
    src/csm/cli/train_mlx.py:627-669): context windows stay within one
    source recording."""
    mk = lambda i, src: TrainingExample(
        f"turn {i}", sine(1.0), 0, metadata={"source_file": src}
    )
    conv = [mk(0, "a.wav"), mk(1, "a.wav"), mk(2, "a.wav"),
            mk(3, "b.wav"), mk(4, "b.wav")]
    gen = ContextualExampleGenerator(max_context_turns=3)

    exs = gen.create_conversational_examples(conv)
    assert len(exs) == len(conv)
    by_text = {e["target"].text: e for e in exs}
    for e in exs:
        src = e["target"].metadata["source_file"]
        assert all(c.metadata["source_file"] == src for c in e["context"])
    assert by_text["turn 3"]["context"] == []  # new file = new conversation
    assert [c.text for c in by_text["turn 4"]["context"]] == ["turn 3"]

    # contrast: the flat generator DOES cross files (why the flag exists)
    flat = {e["target"].text: e for e in gen.create_contextual_examples(conv)}
    assert any(c.metadata["source_file"] == "a.wav"
               for c in flat["turn 3"]["context"])

    # examples without a source_file never join anyone's context
    solo = gen.create_conversational_examples(
        [TrainingExample("x", sine(1.0), 0), TrainingExample("y", sine(1.0), 0)]
    )
    assert all(e["context"] == [] for e in solo)


# ---- frame packing ----


def test_text_frames():
    args = tiny_test_args()
    K = args.audio_num_codebooks
    toks, mask = text_frames(args, [5, 6, 7])
    assert toks.shape == (3, K + 1)
    assert mask[:, K].all() and not mask[:, :K].any()
    np.testing.assert_array_equal(toks[:, K], [5, 6, 7])


def test_audio_frames_eos():
    args = tiny_test_args()
    K = args.audio_num_codebooks
    codes = np.arange(K * 3).reshape(K, 3) % 50 + 1
    toks, mask = audio_frames(args, codes)
    assert toks.shape == (4, K + 1)  # +1 EOS frame
    np.testing.assert_array_equal(toks[:3, :K], codes.T)
    assert (toks[3] == 0).all()  # all-zero EOS
    assert mask[:, :K].all() and not mask[:, K].any()


# ---- dataset ----


@pytest.fixture
def dataset():
    args = tiny_test_args()
    conv = [TrainingExample(f"hello there {i}", sine(1.0 + i * 0.2), i % 2) for i in range(3)]
    exs = ContextualExampleGenerator(2).create_contextual_examples(conv)
    return args, CSMDataset(
        exs, ByteTokenizer(), FakeAudioTokenizer(args.audio_num_codebooks),
        args=args,
    )


def test_dataset_item_contract(dataset):
    args, ds = dataset
    K = args.audio_num_codebooks
    it = ds[2]  # has 2 context turns
    T = it["tokens"].shape[0]
    assert it["tokens"].shape == (T, K + 1)
    assert it["targets"].shape == (T, K)
    assert it["target_mask"].shape == (T,)
    # every masked target equals the NEXT input frame's audio columns
    idx = np.nonzero(it["target_mask"])[0]
    assert len(idx) > 0 and idx[-1] < T - 1
    np.testing.assert_array_equal(
        it["targets"][idx], it["tokens"][idx + 1, :K]
    )
    # last supervised prediction is the all-zero EOS frame
    assert (it["targets"][idx[-1]] == 0).all()
    # target audio frames are contiguous at the tail
    assert (it["tokens_mask"][idx[-1] + 1, :K]).all()


def test_dataset_truncation():
    args = tiny_test_args()
    ds = CSMDataset(
        [TrainingExample("long " * 100, sine(30.0), 0)],
        ByteTokenizer(),
        FakeAudioTokenizer(args.audio_num_codebooks),
        args=args,
        max_seq_len=128,
    )
    it = ds[0]
    assert it["tokens"].shape[0] <= 128
    idx = np.nonzero(it["target_mask"])[0]
    np.testing.assert_array_equal(
        it["targets"][idx], it["tokens"][idx + 1, : args.audio_num_codebooks]
    )


def test_collate_and_buckets(dataset):
    args, ds = dataset
    assert bucket_for(3) == 64
    assert bucket_for(65) == 128
    batch = collate([ds[i] for i in range(len(ds))])
    B, T, _ = batch.tokens.shape
    assert B == 3 and T in (64, 128, 256)
    batches = list(batch_iterator(ds, batch_size=2, shuffle=True, seed=1))
    assert sum(b.tokens.shape[0] for b in batches) == 3
