"""High-level trainers: full fine-tune and LoRA.

Capability equivalent of the reference ``CSMTrainer``
(src/csm/training/trainer.py:26-434) and ``CSMLoRATrainer``
(src/csm/training/lora_trainer.py:29-822): epoch loop with gradient
accumulation, clipping, periodic validation with best-checkpoint saving,
periodic/epoch/final checkpoints, resume, and sample generation.

TPU-first: the per-batch work is ONE jitted step (train_step.py); the
trainer is a thin host loop feeding bucketed batches.  Checkpoints are
orbax (sharded, preemption-safe) instead of .pt files.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import ModelArgs, csm_1b_args
from csm_tpu.training import checkpoint as ckpt
from csm_tpu.training import lora as lora_mod
from csm_tpu.training.dataset_utils import as_batches, prefetch_batches
from csm_tpu.training.optimizer import (
    TrainState,
    init_train_state,
    make_lora_optimizer,
    make_optimizer,
)
from csm_tpu.training.train_step import (
    make_eval_step,
    make_lora_train_step,
    make_train_step,
)


def setup_logger(name: str, log_file: Optional[str] = None, level=logging.INFO):
    """Console+file logger (reference: src/csm/training/utils.py:14-53)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class CSMTrainer:
    """Full-parameter trainer (reference: src/csm/training/trainer.py:26).

    Args mirror the reference surface: model path, output dir, base LR,
    per-component multipliers, semantic/acoustic weights.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        output_dir: str = "./output",
        learning_rate: float = 1e-5,
        backbone_lr_multiplier: float = 0.1,
        decoder_lr_multiplier: float = 1.0,
        embedding_lr_multiplier: float = 0.5,
        semantic_weight: float = 100.0,
        acoustic_weight: float = 1.0,
        weight_decay: float = 0.01,
        args: Optional[ModelArgs] = None,
        params: Optional[dict] = None,
        compute_dtype=jnp.bfloat16,
        remat: bool = True,
        log_file: Optional[str] = None,
        parallel: Optional["ParallelConfig"] = None,
        param_dtype=jnp.float32,
        async_checkpointing: bool = False,
        prefetch_depth: int = 2,
    ):
        """``parallel`` — optional csm_tpu.parallel.mesh.ParallelConfig:
        shard the train state over a device mesh (TP+FSDP on a
        (data, model) mesh, or pipeline stages on a (data, pipe) mesh)
        and place every batch over the data axis.  The same jitted step
        then runs SPMD; batch_size must be a multiple of the data axis size."""
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.logger = setup_logger(
            self.__class__.__name__,
            log_file or os.path.join(output_dir, "training.log"),
        )
        self.parallel = parallel
        self.mesh = None
        if parallel is not None and parallel.enabled:
            self.mesh = parallel.build_mesh()
            self.logger.info(
                f"device mesh {dict(self.mesh.shape)} "
                f"({len(self.mesh.devices.ravel())} devices)"
            )
        self.learning_rate = learning_rate
        self.lr_multipliers = {
            "backbone": backbone_lr_multiplier,
            "decoder": decoder_lr_multiplier,
            "embeddings": embedding_lr_multiplier,
            "other": 1.0,
        }
        self.semantic_weight = semantic_weight
        self.acoustic_weight = acoustic_weight
        self.weight_decay = weight_decay
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.param_dtype = param_dtype

        self.args, self.params = self._load_model(model_path, args, params)
        if param_dtype != jnp.float32:
            # bf16 master weights (the 8B-scale memory recipe; gradient
            # dtype follows — see csm_tpu/training/optimizer.py); integer
            # leaves (a quantized base's w8/w4p) keep their storage dtype
            self.params = jax.tree.map(
                lambda x: x.astype(param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                self.params,
            )
        self.tx = None
        self.state: Optional[TrainState] = None
        self.epoch = 0
        self.global_step = 0
        self.best_val_loss = float("inf")
        # non-blocking checkpoint saves (orbax async writer): the step
        # loop resumes as soon as arrays are snapshotted to host; the
        # ``latest`` pointer commits only after the atomic rename
        self.async_checkpointing = async_checkpointing
        self._ckpt_writer = None
        # host-side batch collation overlap (training.dataset_utils.
        # prefetch_batches); 0 disables
        self.prefetch_depth = prefetch_depth

        from csm_tpu.utils.observability import MetricsLogger

        self.metrics = MetricsLogger(os.path.join(output_dir, "metrics.jsonl"))

    # ---- model loading (reference: trainer.py:90-121) ----

    def _load_model(self, model_path, args, params):
        if params is not None:
            return args or csm_1b_args(), params
        if model_path is None:
            args = args or csm_1b_args()
            from csm_tpu.models.csm import init_csm_params

            self.logger.info("random-initializing model (no model_path)")
            return args, jax.jit(
                lambda: init_csm_params(jax.random.key(0), args, jnp.float32)
            )()
        if model_path.endswith(".pt"):
            from csm_tpu.utils.checkpoint_compat import load_torch_checkpoint

            args = args or csm_1b_args()
            self.logger.info(f"loading torch checkpoint {model_path}")
            return args, jax.tree.map(
                jnp.asarray, load_torch_checkpoint(model_path, args)
            )
        self.logger.info(f"loading orbax checkpoint {model_path}")
        params, args = ckpt.load_params(model_path)
        return args, params

    # ---- optimizer (reference: trainer.py:123-173) ----

    def prepare_optimizer(
        self,
        freeze_backbone: bool = False,
        freeze_decoder: bool = False,
        freeze_embeddings: bool = False,
        max_grad_norm: float = 1.0,
        accumulation_steps: int = 1,
        mu_dtype=None,
        nu_dtype=None,
        grad_microbatches: int = 1,
    ):
        self.params = self._place_params(self.params)
        self.tx = make_optimizer(
            self.params,
            learning_rate=self.learning_rate,
            weight_decay=self.weight_decay,
            max_grad_norm=max_grad_norm,
            lr_multipliers=self.lr_multipliers,
            freeze_backbone=freeze_backbone,
            freeze_decoder=freeze_decoder,
            freeze_embeddings=freeze_embeddings,
            accumulation_steps=accumulation_steps,
            mu_dtype=mu_dtype,
            nu_dtype=nu_dtype,
        )
        self.state = self._init_state(self.params)
        pp = self.parallel is not None and self.parallel.pipeline_parallel > 1
        sp = self.parallel is not None and self.parallel.seq_parallel > 1
        self._step_fn = make_train_step(
            self.args,
            self.tx,
            semantic_weight=self.semantic_weight,
            acoustic_weight=self.acoustic_weight,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            pp_mesh=self.mesh if pp else None,
            pp_microbatches=self.parallel.pp_microbatches if pp else 1,
            seq_mesh=self.mesh if sp else None,
            ring_layout=(self.parallel.ring_layout
                         if self.parallel is not None else "auto"),
            grad_microbatches=grad_microbatches,
        )
        self._eval_fn = make_eval_step(
            self.args,
            semantic_weight=self.semantic_weight,
            acoustic_weight=self.acoustic_weight,
            compute_dtype=self.compute_dtype,
            pp_mesh=self.mesh if pp else None,
            pp_microbatches=self.parallel.pp_microbatches if pp else 1,
            seq_mesh=self.mesh if sp else None,
            ring_layout=(self.parallel.ring_layout
                         if self.parallel is not None else "auto"),
        )
        return self.tx

    # ---- mesh placement (no-ops without a ParallelConfig) ----

    def _place_params(self, params):
        if self.mesh is None:
            return params
        if self.parallel.pipeline_parallel > 1:
            from csm_tpu.parallel.pipeline import shard_params_pp

            return shard_params_pp(params, self.mesh)
        if self.parallel.seq_parallel > 1:
            # sequence-parallel: weights replicated, SEQUENCE sharded —
            # ring attention moves KV, not weights
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P())
            return jax.tree.map(lambda x: jax.device_put(x, sh), params)
        from csm_tpu.parallel.sharding import shard_params

        return shard_params(params, self.mesh, fsdp=self.parallel.fsdp)

    def _place_batch(self, batch):
        if self.mesh is None:
            return batch
        if jax.process_count() > 1:
            # Multi-host: each process feeds only its LOCAL rows of the
            # global batch (its process_batch_slice(B, mesh) shard of the
            # dataset); the logically-global array is assembled without
            # any host ever materializing the full batch.  Works on every
            # mesh layout — (data, model), (data, pipe), (data, seq) —
            # since batch rows shard over the data axis only (the seq
            # axis additionally shards the sequence dim, within-host).
            from csm_tpu.parallel.distributed import global_batch_from_local

            return global_batch_from_local(
                batch, self.mesh,
                seq_sharded=self.parallel.seq_parallel > 1,
            )
        dp = self.mesh.shape["data"]
        if batch.tokens.shape[0] % dp:
            raise ValueError(
                f"batch size {batch.tokens.shape[0]} not divisible by the "
                f"data axis ({dp}); pick batch_size as a multiple"
            )
        if self.parallel.seq_parallel > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sp = self.mesh.shape["seq"]
            if batch.tokens.shape[1] % sp:
                raise ValueError(
                    f"sequence length {batch.tokens.shape[1]} not divisible "
                    f"by the seq axis ({sp})"
                )
            d = lambda *s: NamedSharding(self.mesh, P(*s))  # noqa: E731
            from csm_tpu.training.losses import Batch

            return Batch(
                tokens=jax.device_put(batch.tokens, d("data", "seq", None)),
                tokens_mask=jax.device_put(batch.tokens_mask, d("data", "seq", None)),
                targets=jax.device_put(batch.targets, d("data", "seq", None)),
                target_mask=jax.device_put(batch.target_mask, d("data", "seq")),
            )
        from csm_tpu.parallel.sharding import shard_batch

        return shard_batch(batch, self.mesh)

    def _init_state(self, params) -> TrainState:
        if self.mesh is None:
            return init_train_state(params, self.tx)
        # jitted init propagates the params' shardings into the moments
        with jax.transfer_guard("allow"):
            opt_state = jax.jit(self.tx.init)(params)
        # scalars (step counts) come back single-device/uncommitted; pin
        # them replicated so checkpoint restore can reproduce the exact
        # placement (a restored COMMITTED single-device scalar next to
        # 8-device params fails jit's device check)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())

        def pin(x):
            if isinstance(x.sharding, NamedSharding):
                return x
            return jax.device_put(x, rep)

        opt_state = jax.tree.map(pin, opt_state)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def _run_step(self, key, batch):
        self.state, metrics = self._step_fn(self.state, key, self._place_batch(batch))
        return metrics

    def _params_for_eval(self):
        return self.state.params

    # ---- training loop (reference: trainer.py:175-357) ----

    def train(
        self,
        train_dataset,
        val_dataset=None,
        batch_size: int = 2,
        epochs: int = 1,
        val_every: int = 100,
        save_every: int = 500,
        max_grad_norm: float = 1.0,
        accumulation_steps: int = 1,
        resume_from: Optional[str] = None,
        seed: int = 0,
    ) -> float:
        if self.state is None:
            self.prepare_optimizer(
                max_grad_norm=max_grad_norm, accumulation_steps=accumulation_steps
            )
        if resume_from:
            self.load_checkpoint(resume_from)

        last_loss = float("nan")
        # Metrics are fetched with a ONE-STEP lag: step N's device
        # scalars are read while step N+1 is already dispatched, so the
        # chip never idles on the host metrics round-trip (a per-step
        # ``float(loss)`` would serialize host batch prep against device
        # compute — JAX dispatch is async until something is fetched).
        pending = None  # (global_step, epoch, device metrics of that step)

        def drain(p):
            nonlocal last_loss, pending
            gs, ep, m = p
            m = jax.device_get(m)
            last_loss = float(m["loss"])
            if not np.isfinite(last_loss):
                # NaN/Inf guard (the reference detects and repairs
                # non-finite losses, src/csm/training/utils.py:347-349,
                # mlx_trainer.py:817-821); with a deterministic stack a
                # non-finite loss is a data/LR bug — fail loudly.  The
                # lagged fetch means the saved state may be up to one
                # step PAST the first non-finite loss.
                self.save_checkpoint("nonfinite_abort")
                # flush BEFORE raising: with async checkpointing the
                # commit thread is a daemon — propagating the error to
                # interpreter exit could kill it mid-write, making the
                # "state saved" message below a lie
                self.close()
                raise FloatingPointError(
                    f"non-finite loss {last_loss} at step {gs} "
                    f"(state saved; may include one later step)"
                )
            self.metrics.log(
                gs,
                epoch=ep,
                loss=m["loss"],
                semantic_loss=m["semantic_loss"],
                acoustic_loss=m["acoustic_loss"],
                grad_norm=m["grad_norm"],
            )
            if gs % 10 == 0:
                self.logger.info(
                    f"epoch {ep} step {gs} "
                    f"loss {last_loss:.4f} "
                    f"sem {float(m['semantic_loss']):.4f} "
                    f"ac {float(m['acoustic_loss']):.4f}"
                )

        for epoch in range(self.epoch, epochs):
            self.epoch = epoch
            t_epoch = time.time()
            n_batches = 0
            for batch in prefetch_batches(
                as_batches(
                    train_dataset, batch_size, shuffle=True, seed=seed + epoch
                ),
                depth=self.prefetch_depth,
            ):
                key = jax.random.fold_in(jax.random.key(seed), self.global_step)
                metrics = self._run_step(key, batch)
                self.global_step += 1
                n_batches += 1
                prev, pending = pending, (self.global_step, epoch, metrics)
                if prev is not None:
                    drain(prev)
                at_boundary = (
                    (val_dataset is not None
                     and self.global_step % val_every == 0)
                    or self.global_step % save_every == 0
                )
                if at_boundary and pending is not None:
                    # catch up before validating/saving (infrequent)
                    p, pending = pending, None
                    drain(p)
                if val_dataset is not None and self.global_step % val_every == 0:
                    val_loss = self.validate(val_dataset, batch_size, seed=seed)
                    if val_loss < self.best_val_loss:
                        self.best_val_loss = val_loss
                        self.save_checkpoint("best")
                if self.global_step % save_every == 0:
                    self.save_checkpoint(f"step_{self.global_step}")
            if pending is not None:  # epoch boundary: catch up
                p, pending = pending, None
                drain(p)

            dt = time.time() - t_epoch
            self.logger.info(
                f"epoch {epoch} done: {n_batches} batches in {dt:.1f}s "
                f"({n_batches * batch_size / max(dt, 1e-9):.2f} samples/s)"
            )
            self.save_checkpoint(f"epoch_{epoch}")

        self.save_checkpoint("final")
        self.close()  # "final" is on disk when train() returns
        return last_loss

    def validate(self, val_dataset, batch_size: int = 2, seed: int = 0) -> float:
        """Reference: src/csm/training/trainer.py:359-394."""
        losses, params = [], self._params_for_eval()
        for i, batch in enumerate(
            as_batches(val_dataset, batch_size, shuffle=False)
        ):
            m = self._eval_fn(
                params, jax.random.fold_in(jax.random.key(seed), i),
                self._place_batch(batch),
            )
            losses.append(m["loss"])  # device handle: fetch once below
        val = (
            float(np.mean(jax.device_get(losses))) if losses else float("nan")
        )
        self.logger.info(f"validation loss {val:.4f}")
        return val

    # ---- checkpointing (reference: utils.py:526-574,864-895) ----

    def save_checkpoint(self, name: str) -> str:
        kw = dict(
            epoch=self.epoch,
            global_step=self.global_step,
            loss=self.best_val_loss,
        )
        ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        if self.async_checkpointing:
            if self._ckpt_writer is None:
                self._ckpt_writer = ckpt.AsyncCheckpointWriter()
            path = self._ckpt_writer.save(
                ckpt_dir, name, self.state, self.args, **kw
            )
            self.logger.info(f"saving checkpoint {path} (async)")
        else:
            path = ckpt.save_checkpoint(
                ckpt_dir, name, self.state, self.args, **kw
            )
            self.logger.info(f"saved checkpoint {path}")
        return path

    def wait_for_checkpoints(self) -> None:
        """Block until any in-flight async checkpoint is committed."""
        if self._ckpt_writer is not None:
            self._ckpt_writer.wait()

    def close(self) -> None:
        """Flush and release the async checkpoint writer's background
        resources (orbax AsyncCheckpointer threads).  Idempotent; a later
        save_checkpoint() lazily recreates the writer."""
        w, self._ckpt_writer = self._ckpt_writer, None
        if w is not None:
            w.close()

    def load_checkpoint(self, path: Optional[str] = None):
        self.wait_for_checkpoints()  # never restore under an in-flight save
        if path is None or path == "latest":
            path = ckpt.latest_checkpoint(os.path.join(self.output_dir, "checkpoints"))
            if path is None:
                raise FileNotFoundError("no latest checkpoint to resume from")
        # restore INTO the prepared state's shardings — without a template
        # arrays land host-local, silently defeating mesh placement on
        # resume (and materializing the full 8B tree on one device)
        template = None
        if self.state is not None:
            template = {"params": self.state.params}
            if self.state.opt_state is not None and jax.tree.leaves(
                self.state.opt_state
            ):
                template["opt_state"] = self.state.opt_state
        state, meta = ckpt.load_checkpoint(path, template=template)
        self.state = state
        self.epoch = meta.get("epoch", 0)
        self.global_step = meta.get("global_step", 0)
        self.best_val_loss = meta.get("loss", float("inf"))
        self.logger.info(
            f"resumed from {path} (epoch {self.epoch}, step {self.global_step})"
        )

    # ---- sample generation (reference: trainer.py:396-434) ----

    def generate_sample(
        self, text: str, speaker_id: int = 0, output_path: Optional[str] = None,
        mimi=None, max_audio_length_ms: float = 5_000, text_tokenizer=None,
    ):
        from csm_tpu.generator import Generator

        gen = Generator(
            self._final_params(), self.args, mimi=mimi,
            text_tokenizer=text_tokenizer,
            compute_dtype=self.compute_dtype,
        )
        audio = gen.generate(
            text, speaker=speaker_id, max_audio_length_ms=max_audio_length_ms
        )
        if output_path:
            from csm_tpu.data.audio import save_wav

            save_wav(output_path, audio, gen.sample_rate)
        return audio

    def _final_params(self):
        return self.state.params if self.state is not None else self.params


class CSMLoRATrainer(CSMTrainer):
    """LoRA fine-tuning trainer (reference:
    src/csm/training/lora_trainer.py:29-822).  Optimizes ONLY adapter
    params; ``save_model`` supports lora/full/both modes."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        output_dir: str = "./output",
        learning_rate: float = 1e-4,
        lora_r: int = 8,
        lora_alpha: float = 16.0,
        lora_dropout: float = 0.0,
        target_modules=("q_proj", "v_proj"),
        target_layers=None,
        apply_to_backbone: bool = True,
        apply_to_decoder: bool = True,
        int8_base: bool = False,
        quant_base: Optional[str] = None,
        **kw,
    ):
        # QLoRA-style memory mode: store the FROZEN base transformer
        # stacks quantized; the layer forward dequantizes in the matmul
        # (csm_tpu/models/llama.py) and only the float adapters receive
        # gradients, so training quality rests on the adapters absorbing
        # the quantization error.  ``quant_base``: None | "int8" | "int4"
        # (``int8_base=True`` is the original alias for "int8").  int8
        # halves the frozen-weight HBM — fits 8B LoRA on ONE 16 GiB chip
        # (__graft_entry__._compile_8b_int8_lora); int4 (grouped scales,
        # csm_tpu/utils/quantize.quantize_weight_int4) quarters it at a
        # larger quantization error for the adapters to absorb.
        if int8_base and quant_base not in (None, "int8"):
            raise ValueError("pass either int8_base or quant_base, not both")
        quant_base = "int8" if int8_base else quant_base
        if quant_base not in (None, "int8", "int4"):
            raise ValueError(f"quant_base must be int8|int4, got {quant_base!r}")
        self.quant_base = quant_base
        self.int8_base = quant_base == "int8"  # kept for back-compat callers
        par = kw.get("parallel")
        if quant_base is not None and par is not None and (
            par.model_parallel > 1 or par.fsdp or par.pipeline_parallel > 1
        ):
            raise ValueError(
                "a quantized base (int8_base / quant_base) supports "
                "single-device, data-parallel and sequence-parallel "
                "layouts (the point is NOT needing model sharding); drop "
                "the quantized-base or the model-sharding flags"
            )
        super().__init__(
            model_path=model_path, output_dir=output_dir,
            learning_rate=learning_rate, **kw,
        )
        if quant_base is not None:
            from csm_tpu.utils.quantize import (
                is_quantized, is_quantized_int4, quantize_csm_params,
                quantize_csm_params_int4)

            # already-quantized base (multi-speaker trainers share ONE
            # frozen base; the streaming .pt load path below quantizes
            # during upload): reuse it — re-jitting would copy
            # ~1 GiB/speaker
            probe = self.params["backbone"]["wq"]
            if quant_base == "int8" and not is_quantized(probe):
                self.params = jax.jit(quantize_csm_params)(self.params)
            elif quant_base == "int4" and not is_quantized_int4(probe):
                self.params = jax.jit(quantize_csm_params_int4)(self.params)
        # NOTE on __init__ order: self.quant_base is set BEFORE
        # super().__init__, so the _load_model override below sees it.
        self.lora_config = lora_mod.LoRAConfig(
            r=lora_r,
            alpha=lora_alpha,
            dropout=lora_dropout,
            target_modules=tuple(target_modules),
            target_layers=None if target_layers is None else tuple(target_layers),
            apply_to_backbone=apply_to_backbone,
            apply_to_decoder=apply_to_decoder,
        )
        self.lora_params = lora_mod.init_lora_params(
            jax.random.key(42), self.args, self.lora_config
        )
        eff = lora_mod.parameter_efficiency(self.params, self.lora_params)
        self.logger.info(
            f"LoRA r={lora_r} alpha={lora_alpha} targets={target_modules}: "
            f"{lora_mod.count_params(self.lora_params):,} trainable params "
            f"({eff * 100:.3f}% of base)"
        )

    def _load_model(self, model_path, args, params):
        if (
            self.quant_base is not None
            and model_path is None
            and params is None
        ):
            from csm_tpu.models.config import csm_param_count

            a = args or csm_1b_args()
            if 2 * csm_param_count(a) > (8 << 30):
                # big flavors (8B): the float tree can never exist on the
                # chip — initialize straight into the quantized form
                from csm_tpu.utils.quantize import init_csm_params_quantized

                self.logger.info(
                    f"random-initializing quantized ({self.quant_base}) "
                    f"base (leaf-streamed; no model_path)"
                )
                return a, init_csm_params_quantized(
                    jax.random.key(0), a, self.quant_base
                )
        if (
            self.quant_base is not None
            and model_path is not None
            and model_path.endswith((".pt", ".safetensors"))
        ):
            # Quantize DURING upload, leaf-by-leaf: "load bf16 then
            # quantize" needs the full float tree on device first, which
            # at 8B (~16 GiB bf16) is more than the chip — the whole
            # point of the quantized-base mode.
            from csm_tpu.utils.checkpoint_compat import load_torch_checkpoint
            from csm_tpu.utils.quantize import quantize_csm_params_streaming

            args = args or csm_1b_args()
            self.logger.info(
                f"loading torch checkpoint {model_path} "
                f"(streaming {self.quant_base} quantization)"
            )
            host = load_torch_checkpoint(model_path, args)
            return args, quantize_csm_params_streaming(
                host, mode=self.quant_base
            )
        return super()._load_model(model_path, args, params)

    def prepare_optimizer(
        self, max_grad_norm: float = 1.0, accumulation_steps: int = 1, **_ignored
    ):
        self.params = self._place_params(self.params)
        pp = self.parallel is not None and self.parallel.pipeline_parallel > 1
        if pp:
            from csm_tpu.parallel.pipeline import shard_lora_pp

            self.lora_params = shard_lora_pp(self.lora_params, self.mesh)
        self.tx = make_lora_optimizer(
            learning_rate=self.learning_rate,
            max_grad_norm=max_grad_norm,
            accumulation_steps=accumulation_steps,
        )
        self.state = self._init_state(self.lora_params)
        self._lora_step_fn = make_lora_train_step(
            self.args,
            self.tx,
            self.lora_config.scaling,
            semantic_weight=self.semantic_weight,
            acoustic_weight=self.acoustic_weight,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            lora_dropout=self.lora_config.dropout,
            pp_mesh=self.mesh if pp else None,
            pp_microbatches=self.parallel.pp_microbatches if pp else 1,
            seq_mesh=(self.mesh if self.parallel is not None
                      and self.parallel.seq_parallel > 1 else None),
            ring_layout=(self.parallel.ring_layout
                         if self.parallel is not None else "auto"),
        )
        self._eval_fn = self._make_lora_eval()
        return self.tx

    def _make_lora_eval(self):
        from csm_tpu.training.losses import compute_loss

        scaling = self.lora_config.scaling
        args = self.args
        sw, aw, cd = self.semantic_weight, self.acoustic_weight, self.compute_dtype
        pp = self.parallel is not None and self.parallel.pipeline_parallel > 1
        sp = self.parallel is not None and self.parallel.seq_parallel > 1
        pp_mesh = self.mesh if pp else None
        pp_mb = self.parallel.pp_microbatches if pp else 1
        seq_mesh = self.mesh if sp else None

        @jax.jit
        def eval_step(lora, key, batch):
            _, m = compute_loss(
                self.params, args, key, batch,
                semantic_weight=sw, acoustic_weight=aw, compute_dtype=cd,
                lora=lora, lora_scale=scaling,
                pp_mesh=pp_mesh, pp_microbatches=pp_mb,
                seq_mesh=seq_mesh,
                ring_layout=(self.parallel.ring_layout
                             if self.parallel is not None else "auto"),
            )
            return m

        return eval_step

    def _run_step(self, key, batch):
        self.state, metrics = self._lora_step_fn(self.state, self.params, key, batch)
        return metrics

    def _params_for_eval(self):
        return self.state.params  # the adapter tree

    # ---- artifacts (reference: lora_trainer.py:459-633) ----

    def save_model(self, path: str, save_mode: str = "lora") -> list[str]:
        out = []
        if save_mode in ("lora", "both"):
            p = path + ("_lora" if save_mode == "both" else "")
            out.append(
                lora_mod.save_lora(p, self.state.params, self.lora_config, self.args)
            )
        if save_mode in ("full", "both"):
            merged = lora_mod.merge_lora(
                self.params, self.state.params, self.lora_config
            )
            p = path + ("_full" if save_mode == "both" else "")
            out.append(
                ckpt.save_checkpoint(
                    os.path.dirname(p) or ".", os.path.basename(p),
                    TrainState(merged, (), jnp.zeros((), jnp.int32)),
                    self.args, epoch=self.epoch, global_step=self.global_step,
                )
            )
        self.logger.info(f"saved model artifacts: {out}")
        return out

    def load_lora_weights(self, path: str):
        lora, lcfg, _ = lora_mod.load_lora(path)
        self.lora_config = lcfg
        self.lora_params = lora
        if self.state is not None:
            self.state = init_train_state(lora, self.tx)

    def save_checkpoint(self, name: str) -> str:
        """LoRA checkpoints store the adapter tree as ``params``."""
        return super().save_checkpoint(name)

    def _final_params(self):
        if self.state is None:
            return self.params
        return lora_mod.merge_lora(self.params, self.state.params, self.lora_config)
