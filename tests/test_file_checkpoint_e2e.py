"""File-level checkpoint-format e2e (VERDICT round-2 item #7).

The real public weights arrive as FILES: ``ckpt.pt`` (torch.save,
torchtune names — reference src/csm/generator.py:221-244), a Mimi
``model.safetensors`` (HF ``MimiModel`` names, generator.py:66-70) and
SilentCipher ``*.ckpt`` torch files (watermarking/utils.py:10-24).  The
in-memory converters are parity-tested elsewhere; THIS test proves the
artifact formats themselves: it writes each file to disk in its exact
on-disk format and drives the CLIs through file paths only — the day-1
user path.

The CSM checkpoint uses the ``tiny`` file flavor (tiny layers, FULL 1B
token geometry: same key set, dtypes, token-space shapes — see
``tiny_file_args``); the Mimi checkpoint is the FULL-SIZE HF model (real
key names and shapes).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from rig import scaled

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(argv):
    return subprocess.run(
        [sys.executable, "-m"] + argv,
        cwd=REPO, capture_output=True, text=True, timeout=scaled(900),
    )


def _write_csm_ckpt(path):
    """Random tiny-file-flavor params -> reference-format ckpt.pt."""
    import jax
    import jax.numpy as jnp
    import torch

    from csm_tpu.models.config import tiny_file_args
    from csm_tpu.models.csm import init_csm_params
    from csm_tpu.utils.checkpoint_compat import export_to_torch_names

    args = tiny_file_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export_to_torch_names(params, args).items()
    }
    # the reference's load path is torch.load -> load_state_dict on the
    # raw top-level dict (src/csm/generator.py:240-241)
    torch.save(sd, path)
    return args


def _write_mimi_safetensors(path):
    """FULL-SIZE random HF MimiModel -> model.safetensors (the exact file
    kyutai/mimi ships; reference loads it via transformers,
    src/csm/generator.py:66-70)."""
    import transformers

    from safetensors.torch import save_file

    torch_model = transformers.MimiModel(transformers.MimiConfig())
    sd = {k: v.contiguous() for k, v in torch_model.state_dict().items()}
    save_file(sd, path)


def _write_silentcipher_ckpts(ckpt_dir):
    """Random state dicts with sony/silentcipher's exact key layout
    (main.{i}.conv/gate/bn + linear; dec_m interleaves Dropout so convs
    sit at odd indices) -> enc_c.ckpt / dec_c.ckpt / dec_m_0.ckpt."""
    import torch

    g = torch.Generator().manual_seed(0)

    def gated(out_ch, in_ch, kh, kw):
        return {
            "conv.weight": torch.randn(out_ch, in_ch, kh, kw, generator=g) * 0.1,
            "conv.bias": torch.zeros(out_ch),
            "gate.weight": torch.randn(out_ch, in_ch, kh, kw, generator=g) * 0.1,
            "gate.bias": torch.zeros(out_ch),
            "bn.weight": torch.ones(out_ch),
            "bn.bias": torch.zeros(out_ch),
            "bn.running_mean": torch.zeros(out_ch),
            "bn.running_var": torch.ones(out_ch),
        }

    def flat(prefix, d):
        return {f"{prefix}.{k}": v for k, v in d.items()}

    # mirror the reference layer/channel plan exactly
    # (csm_tpu/watermarking/model.py init_watermark_params: enc 1->32->32->32,
    # dec_c 96->96->96->1(k1), dec_m 1->128->(128x8)->5, message_dim=5,
    # message_band_size=512)
    C, M, BAND = 128, 5, 512
    enc = {}
    enc.update(flat("main.0", gated(32, 1, 3, 3)))
    enc.update(flat("main.1", gated(32, 32, 3, 3)))
    enc.update(flat("main.2", gated(32, 32, 3, 3)))
    enc["linear.weight"] = torch.randn(BAND, M, generator=g) * 0.05
    enc["linear.bias"] = torch.zeros(BAND)

    dec_c = {}
    dec_c.update(flat("main.0", gated(96, 96, 3, 3)))
    dec_c.update(flat("main.1", gated(96, 96, 3, 3)))
    dec_c.update(flat("main.2", gated(96, 96, 3, 3)))
    dec_c.update(flat("main.3", gated(1, 96, 1, 1)))

    dec_m = {}  # Dropout modules interleave: convs sit at odd indices
    dec_m.update(flat("main.1", gated(C, 1, 3, 3)))
    for i in range(8):
        dec_m.update(flat(f"main.{3 + 2 * i}", gated(C, C, 3, 3)))
    dec_m.update(flat("main.19", gated(M, C, 3, 3)))
    dec_m["linear.weight"] = torch.randn(1, BAND, generator=g) * 0.05
    dec_m["linear.bias"] = torch.zeros(1)

    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save(enc, os.path.join(ckpt_dir, "enc_c.ckpt"))
    torch.save(dec_c, os.path.join(ckpt_dir, "dec_c.ckpt"))
    torch.save(dec_m, os.path.join(ckpt_dir, "dec_m_0.ckpt"))


@pytest.mark.slow
def test_ckpt_pt_to_generate_cli(tmp_path):
    """torch.save'd ckpt.pt + HF-format Mimi safetensors on disk ->
    ``csm-generate --model-path --mimi-path`` -> playable wav.  Any
    format mismatch (key names, tensor layouts, containers) fails HERE
    instead of on day 1 with the real weights."""
    ckpt = str(tmp_path / "ckpt.pt")
    mimi = str(tmp_path / "model.safetensors")
    out = str(tmp_path / "out.wav")
    _write_csm_ckpt(ckpt)
    _write_mimi_safetensors(mimi)

    r = _run_cli([
        "csm_tpu.cli.generate",
        "--model-path", ckpt, "--mimi-path", mimi, "--flavor", "tiny",
        "--text", "file level end to end", "--output", out,
        "--max-audio-length-ms", "400", "--no-watermark", "--seed", "1",
        "--allow-byte-tokenizer",
    ])
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"

    from csm_tpu.data.audio import load_wav

    audio, sr = load_wav(out)
    assert sr == 24_000
    assert 0 < audio.shape[0] <= 5 * 1920


@pytest.mark.slow
def test_lora_adapter_to_generate_cli(tmp_path, monkeypatch):
    """lora-only artifact (csm-finetune-lora save-mode lora) + base
    ckpt.pt -> ``csm-generate --lora-path`` — the adapter merges at load,
    no full export needed."""
    # the in-process loads below build a Generator (tokenizer incl.);
    # no HF cache in this environment -> permit the byte fallback
    monkeypatch.setenv("CSM_TPU_ALLOW_BYTE_TOKENIZER", "1")
    import jax
    import jax.numpy as jnp

    from csm_tpu.generator import load_csm_1b
    from csm_tpu.models.config import tiny_file_args
    from csm_tpu.training.lora import (
        LoRAConfig, init_lora_params, save_lora,
    )

    ckpt = str(tmp_path / "ckpt.pt")
    mimi = str(tmp_path / "model.safetensors")
    adapter = str(tmp_path / "adapter")
    out = str(tmp_path / "out.wav")
    args = _write_csm_ckpt(ckpt)
    _write_mimi_safetensors(mimi)
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(7), args, lcfg)
    lora = jax.tree.map(lambda x: x + 0.01, lora)  # nonzero B -> real delta
    save_lora(adapter, lora, lcfg, args)

    # the merge changes the targeted projections
    base = load_csm_1b(ckpt, mimi_path=mimi, args=tiny_file_args())
    tuned = load_csm_1b(
        ckpt, mimi_path=mimi, args=tiny_file_args(), lora_path=adapter
    )
    # Generator applies the fused single-device decode layout, so the
    # merged q-projection lives in "wqkv" (round-3 layout; "wq" with
    # CSM_TPU_NO_FUSE=1)
    proj = "wqkv" if "wqkv" in tuned.params["backbone"] else "wq"
    assert not np.array_equal(
        np.asarray(tuned.params["backbone"][proj], np.float32),
        np.asarray(base.params["backbone"][proj], np.float32),
    )
    # shape-mismatched adapter is rejected loudly
    from csm_tpu.models.config import tiny_test_args

    bad = str(tmp_path / "bad_adapter")
    targs = tiny_test_args()
    save_lora(bad, init_lora_params(jax.random.key(8), targs, lcfg),
              lcfg, targs)
    with pytest.raises(ValueError, match="different model shape"):
        load_csm_1b(ckpt, mimi_path=mimi, args=tiny_file_args(),
                    lora_path=bad)

    r = _run_cli([
        "csm_tpu.cli.generate",
        "--model-path", ckpt, "--mimi-path", mimi, "--flavor", "tiny",
        "--lora-path", adapter,
        "--text", "adapter merged at load", "--output", out,
        "--max-audio-length-ms", "400", "--no-watermark", "--seed", "1",
        "--allow-byte-tokenizer",
    ])
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"

    from csm_tpu.data.audio import load_wav

    audio, sr = load_wav(out)
    assert sr == 24_000 and audio.shape[0] > 0


@pytest.mark.slow
def test_silentcipher_ckpts_to_verify_cli(tmp_path):
    """SilentCipher-format *.ckpt files on disk -> ``csm-verify
    --watermark-ckpt`` (BN folding + key layout proven at file level)."""
    ckpt_dir = str(tmp_path / "silentcipher")
    _write_silentcipher_ckpts(ckpt_dir)

    wav = str(tmp_path / "probe.wav")
    from csm_tpu.data.audio import save_wav

    rng = np.random.default_rng(0)
    save_wav(wav, (rng.standard_normal(24_000) * 0.1).astype(np.float32), 24_000)

    r = _run_cli(["csm_tpu.cli.verify", wav, "--watermark-ckpt", ckpt_dir])
    # random weights: watermarked yes/no are both valid -- what matters is
    # that the files parsed, converted, and the CNN ran
    assert r.returncode in (0, 1), f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
