"""Stage-1 training: pjit data-parallel loop with gradient accumulation.

TPU-native replacement for the reference's fairseq-hydra-train + c10d DDP
setup (conf/lrs3/multi_target.yaml): one jitted train step over a
jax.sharding.Mesh; the batch carries a leading accumulation axis
(update_freq=8) consumed by lax.scan inside the step, and XLA inserts the
gradient all-reduce over the 'data' axis automatically (params replicated,
batch sharded).

Optimizer parity: fairseq Adam(0.9, 0.98, eps 1e-8) with decoupled weight
decay 0.01, cosine schedule with 10k warmup over 150k updates, clip-norm 10,
grads normalized by the summed sample_size (sentence count) like fairseq.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import NamedSharding, PartitionSpec as P

from lip2speech_tpu.core.config import PipelineConfig, Stage1TrainConfig
from lip2speech_tpu.models.multi_target import MultiTargetModel
from lip2speech_tpu.parallel.mesh import DATA_AXIS
from lip2speech_tpu.train.losses import stage1_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: Stage1TrainConfig):
    """fairseq cosine LR: linear warmup to peak, cosine decay to ~0."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=min(cfg.warmup_updates, max(cfg.max_updates - 1, 1)),
        decay_steps=max(cfg.max_updates, cfg.warmup_updates + 1),
        end_value=cfg.lr * 1e-3,
    )


def _frontend_label_tree(params, frozen: bool):
    """Label pytree for optax.multi_transform: frozen frontend params get
    zero updates (the reference freezes via requires_grad=False /
    freeze_finetune_updates = max_updates)."""

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if frozen and top.startswith("frontend"):
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: Stage1TrainConfig, params, frontend_frozen: bool):
    base = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    labels = _frontend_label_tree(params, frontend_frozen)
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, labels)


def create_train_state(cfg: PipelineConfig, rng: jax.Array, sample_batch: dict,
                       mesh=None):
    """When a mesh with a model axis > 1 is given, transformer FFN/attention
    weights are tensor-parallel sharded (parallel/sharding_rules.py); the
    optimizer state inherits the same shardings elementwise."""
    from lip2speech_tpu.ops.nn import dequantize_video

    model = MultiTargetModel(cfg.model)
    init_rng, drop_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": drop_rng},
        dequantize_video(jnp.asarray(sample_batch["video"])),
        jnp.asarray(sample_batch["frames_mask"]),
        jnp.asarray(sample_batch["spk_emb"]),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from lip2speech_tpu.parallel.sharding_rules import shard_params

        params = shard_params(params, mesh)
    tx = make_optimizer(cfg.stage1, params, cfg.model.frontend.frozen)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    return model, tx, state


def make_train_step(model: MultiTargetModel, tx, cfg: PipelineConfig, mesh=None):
    """Returns train_step(state, batch, rng) -> (state, logs).

    batch leaves have shape (accum, micro_batch, ...). When a mesh is given,
    the micro_batch dim is sharded over the data axis.
    """
    s1 = cfg.stage1
    pad_id = cfg.model.units.pad

    def micro_loss(params, batch_stats, micro, rng):
        from lip2speech_tpu.ops.nn import dequantize_video

        video = dequantize_video(micro["video"])
        spk = micro["spk_emb"]
        if s1.bf16_compute:
            # bf16 compute with f32 master weights: the cast is inside the
            # loss, so autodiff returns f32 grads (cast's VJP casts back)
            def cast(t, to=jnp.bfloat16, frm=jnp.float32):
                return jax.tree_util.tree_map(
                    lambda x: x.astype(to) if x.dtype == frm else x, t)

            params = cast(params)
            # batch_stats stay f32: batch_norm_train computes statistics and
            # the momentum update in f32 regardless of the activation dtype
            video = video.astype(jnp.bfloat16)
            spk = spk.astype(jnp.bfloat16)
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(
            variables, video, micro["frames_mask"], spk,
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
        if s1.bf16_compute:
            # losses in f32 (softmax/CE accuracy); running stats carried f32
            outputs = cast(outputs, to=jnp.float32, frm=jnp.bfloat16)
            new_stats = cast(new_stats, to=jnp.float32, frm=jnp.bfloat16)
        loss, sample_size, logs = stage1_loss(
            outputs, micro, pad_id,
            label_smoothing=s1.label_smoothing, mel_weight=s1.mel_weight,
            text_weight=s1.text_weight, sentence_avg=s1.sentence_avg)
        return loss, (sample_size, logs, new_stats)

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        accum = batch["video"].shape[0]

        def scan_body(carry, inp):
            grad_sum, ss_sum, stats, i = carry
            micro = inp
            step_rng = jax.random.fold_in(rng, i)
            (loss, (ss, logs, new_stats)), grads = grad_fn(
                state.params, stats, micro, step_rng)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            return (grad_sum, ss_sum + ss, new_stats, i + 1), logs

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grad_sum, ss_sum, new_stats, _), logs = jax.lax.scan(
            scan_body, (zero_grads, jnp.zeros((), jnp.float32), state.batch_stats,
                        jnp.zeros((), jnp.int32)),
            batch)

        # fairseq: grads of summed loss divided by total sample_size
        denom = jnp.maximum(ss_sum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, grad_sum)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        mean_logs = jax.tree_util.tree_map(jnp.sum, logs)  # summed over accum
        mean_logs = {**mean_logs, "sample_size": ss_sum,
                     "grad_norm": optax.global_norm(grads)}
        return new_state, mean_logs

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    # the Pallas flash-attention kernel inside the step cannot be
    # auto-partitioned by GSPMD — declare the mesh so it self-wraps in
    # shard_map (ops/pallas_rel_attention.set_flash_mesh)
    from lip2speech_tpu.ops.pallas_rel_attention import set_flash_mesh

    set_flash_mesh(mesh)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, DATA_AXIS))  # (accum, batch, ...)
    # state sharding is left to propagate from the actual inputs (params may
    # carry tensor-parallel shardings from create_train_state)
    return jax.jit(
        train_step,
        in_shardings=(None, data, repl),
        donate_argnums=(0,),
    )


def pad_batch_rows(batch: dict, bsz: int, pad_id: int) -> dict:
    """Pad the batch dimension up to bsz with dummy rows.

    Dummy rows are all-masked (frames_mask False, unit_tokens all pad), so
    they contribute exactly zero loss AND zero sample_size (label_smoothed_ce
    counts only sentences with >=1 valid token). This replaces truncating a
    group of micro-batches to the smallest one, which silently dropped tail
    samples (fairseq instead pads to required_batch_size_multiple)."""
    b = batch["video"].shape[0]
    if b >= bsz:
        return batch
    out = {}
    for k, v in batch.items():
        if k == "ids":
            out[k] = list(v) + [""] * (bsz - b)
            continue
        pad = [(0, 0)] * v.ndim
        pad[0] = (0, bsz - b)
        out[k] = np.pad(v, pad, constant_values=_pad_value(k, v, pad_id))
    return out


def _pad_value(k: str, v, pad_id: int):
    if k == "unit_tokens":
        return pad_id
    if v.dtype == np.bool_:
        return False
    if k == "video" and v.dtype == np.uint8:
        # uint8 wire format: pad with the pixel closest to normalized 0
        from lip2speech_tpu.data.transforms import UINT8_FILL

        return UINT8_FILL
    return 0


def stack_accum(batches: list[dict], pad_id: int | None = None,
                batch_size: int | None = None) -> dict:
    """Stack update_freq host micro-batches into the (accum, B, ...) layout.

    Micro-batches may differ in batch size (bucket tails) and sequence length
    (different buckets): rows are padded with zero-loss dummies, time with the
    usual masked padding. Pass batch_size to pad every micro-batch to the
    configured static size (required for an even split over the data mesh
    axis, and keeps one compiled shape per bucket)."""
    if pad_id is not None:
        t = max(b["video"].shape[1] for b in batches)
        bsz = batch_size or max(b["video"].shape[0] for b in batches)
        padded = []
        for b in batches:
            b = pad_batch_rows(b, bsz, pad_id)
            dt = t - b["video"].shape[1]
            if dt:
                nb = {}
                for k, v in b.items():
                    if k == "ids":
                        nb[k] = v
                        continue
                    pad = [(0, 0)] * v.ndim
                    if k in ("video", "frames_mask"):
                        pad[1] = (0, dt)
                    elif k == "unit_tokens":
                        pad[1] = (0, 2 * t + 1 - v.shape[1])
                    elif k == "mel":
                        pad[1] = (0, 4 * t - v.shape[1])
                    nb[k] = np.pad(v, pad,
                                   constant_values=_pad_value(k, v, pad_id))
                b = nb
            padded.append(b)
        batches = padded
    keys = [k for k in batches[0] if k != "ids"]
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def make_eval_step(model: MultiTargetModel, cfg: PipelineConfig):
    """Jitted validation step: (n_correct, n_valid, nll_sum) on one batch."""
    pad_id = cfg.model.units.pad

    @jax.jit
    def eval_step(params, batch_stats, batch):
        from lip2speech_tpu.ops.nn import dequantize_video

        variables = {"params": params, "batch_stats": batch_stats}
        outputs = model.apply(variables, dequantize_video(batch["video"]),
                              batch["frames_mask"],
                              batch["spk_emb"], train=False)
        from lip2speech_tpu.train.losses import label_smoothed_ce, unit_accuracy

        _, nll, _ = label_smoothed_ce(outputs["unit_logits"],
                                      batch["unit_tokens"], pad_id)
        n_correct, total = unit_accuracy(outputs["unit_logits"],
                                         batch["unit_tokens"], pad_id)
        return n_correct, total, nll

    return eval_step


def evaluate(model: MultiTargetModel, state: TrainState, ds, batch_size: int,
             cfg: PipelineConfig, eval_step=None) -> dict:
    """Unit accuracy + NLL over a full validation dataset.

    Replaces fairseq's valid loop; the reference selects best checkpoints on
    this accuracy (conf/lrs3/multi_target.yaml: best_checkpoint_metric:
    accuracy, maximize_best_checkpoint_metric: true)."""
    if eval_step is None:
        eval_step = make_eval_step(model, cfg)
    n_correct = total = nll = 0.0
    for batch in ds.batches(batch_size, shuffle=False):
        batch = {k: v for k, v in batch.items() if k != "ids"}
        c, t, n = eval_step(state.params, state.batch_stats, batch)
        n_correct += float(c)
        total += float(t)
        nll += float(n)
    total = max(total, 1.0)
    return {"accuracy": n_correct / total, "nll": nll / total,
            "n_tokens": int(total)}
