"""End-to-end synthesis: mouth video + speaker embedding -> 16 kHz waveform.

This is the single-device-program replacement for the reference's five-process
relay (SURVEY.md §3.1: gateway -> Redis -> dlib -> disk -> decoder HTTP ->
disk -> vocoder HTTP -> ffmpeg). The whole graph

    video (B,T,88,88,1) --frontend+conformer--> unit logits (B,2T,204)
                                            +--> mel (B,4T,80)
    units = masked argmax ------------------+
    vocoder(units, mel, spk) ------------------> wav (B, 640*T)

is one jitted XLA program per (batch, bucket-length) signature. Host code
only does video decode, cropping, and WAV serialization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.core.config import PipelineConfig
from lip2speech_tpu.data.stage1 import pick_bucket
from lip2speech_tpu.data.transforms import prepare_video
from lip2speech_tpu.data.video_io import load_video_gray
from lip2speech_tpu.models.multi_target import MultiTargetModel
from lip2speech_tpu.models.vocoder import MelCodeGenerator


def load_stage1_variables(path: str | Path, cfg: PipelineConfig) -> dict:
    """Stage-1 variables from a torch .pt (converted) or an orbax s1_* dir."""
    path = Path(path)
    if path.is_file():  # torch .pt
        from lip2speech_tpu.convert.torch_to_jax import (
            convert_multi_target, load_torch_state)

        return convert_multi_target(load_torch_state(path), cfg.model)
    from lip2speech_tpu.train.checkpoint import load_pytree

    state = load_pytree(path)
    return {"params": state["params"],
            "batch_stats": state.get("batch_stats", {})}


def load_vocoder_params(path: str | Path, cfg: PipelineConfig) -> dict:
    """Vocoder generator params from a torch g_*.pt or an orbax g_* dir."""
    path = Path(path)
    if path.is_file():
        from lip2speech_tpu.convert.torch_to_jax import (
            convert_vocoder_generator, load_torch_state)

        return convert_vocoder_generator(load_torch_state(path), cfg.vocoder)
    from lip2speech_tpu.train.checkpoint import load_pytree

    return load_pytree(path)["generator"]


@dataclass
class SynthesisResult:
    wav: np.ndarray          # (n_samples,) float32 in [-1, 1], or int16 PCM
                             # when the pipeline was built with emit_int16
    units: np.ndarray        # (2 * n_frames,) int32
    mel: np.ndarray          # (4 * n_frames, 80) float32
    sample_rate: int = 16_000


class Lip2SpeechPipeline:
    """Bundles stage-1 + vocoder params behind one jitted e2e function."""

    def __init__(
        self,
        cfg: PipelineConfig,
        stage1_variables: dict[str, Any],
        vocoder_params: dict[str, Any],
        compute_dtype: Any = None,
        emit_int16: bool = False,
        mesh=None,
        fused_tail: bool | None = None,
        use_flash: bool | None = None,
    ):
        """compute_dtype=jnp.bfloat16 casts weights + activations for the
        serving path (HBM-bandwidth win on TPU); logits/softmax/norms stay in
        the op-local precision rules. emit_int16 converts the waveform to
        PCM16 ON DEVICE (the serving wire format), halving the device->host
        transfer — worth ~10% end-to-end on the TPU relay.

        mesh: a jax.sharding.Mesh with a 'data' axis for multi-chip
        data-parallel serving — the request batch is sharded over chips,
        params replicated (GSPMD inserts no collectives in the forward, so
        throughput scales linearly with the mesh). synthesise_batch pads
        ragged batches up to a multiple of the data axis.

        fused_tail: run the vocoder's 128-lane stages as VMEM-fused Pallas
        trios (ops/pallas_fused_tail.py; exact, same checkpoint tree).
        None = auto: on when serving on TPU or when the config opted in,
        off elsewhere. True/False force it either way (False is the
        escape hatch even for a config that enabled it). Works under
        `mesh` too — the mesh path runs the program through shard_map,
        which (unlike bare GSPMD sharding) admits the pallas_call."""
        import dataclasses as _dc

        self.cfg = cfg
        # use_flash: run the conformer's rel-attention as the Pallas flash
        # kernel (ops/pallas_rel_attention.py). None = auto: on when serving
        # on TPU (chip A/B at the headline shapes: e2e 137 -> 89 ms wall
        # under a loaded relay — the dense path's (B,H,T,2T-1) position
        # matrix is bandwidth-bound; flash keeps it in VMEM). Same
        # serve-time fallback as the fused tail below.
        platform = jax.devices()[0].platform
        if use_flash is None:
            use_flash = cfg.model.conformer.use_flash or platform == "tpu"
        model_cfg = cfg.model
        if model_cfg.conformer.use_flash != use_flash:
            model_cfg = _dc.replace(
                model_cfg, conformer=_dc.replace(model_cfg.conformer,
                                                 use_flash=use_flash))
        self.model = MultiTargetModel(model_cfg)
        voc_cfg = cfg.vocoder
        if fused_tail is None:
            fused_tail = voc_cfg.fused_tail_kernel or platform == "tpu"
        if voc_cfg.fused_tail_kernel != fused_tail:
            voc_cfg = _dc.replace(voc_cfg, fused_tail_kernel=fused_tail)
        self.vocoder = MelCodeGenerator(voc_cfg)
        self.stage1_variables = stage1_variables
        self.vocoder_params = vocoder_params
        self.compute_dtype = compute_dtype
        self.emit_int16 = emit_int16
        self.mesh = mesh
        self._jitted = functools.lru_cache(maxsize=None)(self._build)

    @classmethod
    def from_checkpoints(cls, cfg: PipelineConfig, stage1_path: str | Path,
                         vocoder_path: str | Path, compute_dtype: Any = None,
                         emit_int16: bool = False,
                         fused_tail: bool | None = None,
                         use_flash: bool | None = None) -> "Lip2SpeechPipeline":
        """Real-weight pipeline from checkpoints: each path is either a torch
        .pt (converted on load, reference inference_server.py:106-176 preloads
        the published .pt pair the same way) or a native orbax directory
        (s1_* / g_*)."""
        return cls(cfg, load_stage1_variables(stage1_path, cfg),
                   load_vocoder_params(vocoder_path, cfg),
                   compute_dtype=compute_dtype, emit_int16=emit_int16,
                   fused_tail=fused_tail, use_flash=use_flash)

    @classmethod
    def initialize_random(cls, cfg: PipelineConfig, seed: int = 0,
                          frames: int = 8,
                          fused_tail: bool | None = None,
                          use_flash: bool | None = None) -> "Lip2SpeechPipeline":
        """Random-weight pipeline (benchmarks / smoke tests)."""
        rng = jax.random.PRNGKey(seed)
        r1, r2 = jax.random.split(rng)
        model = MultiTargetModel(cfg.model)
        video = jnp.zeros((1, frames, cfg.video.mouth_size, cfg.video.mouth_size, 1))
        mask = jnp.ones((1, frames), bool)
        spk = jnp.zeros((1, cfg.model.spk_emb_dim))
        s1_vars = model.init({"params": r1, "dropout": r1}, video, mask, spk, train=False)
        vocoder = MelCodeGenerator(cfg.vocoder)
        code = jnp.zeros((1, 2 * frames), jnp.int32)
        mel = jnp.zeros((1, 4 * frames, cfg.model.mel_dim))
        v_vars = vocoder.init({"params": r2}, code, mel, spk, deterministic=True)
        return cls(cfg, dict(s1_vars), dict(v_vars["params"]),
                   fused_tail=fused_tail, use_flash=use_flash)

    def set_mesh(self, mesh) -> None:
        """Attach a serving mesh after construction (server --data-parallel
        assigns the mesh once all checkpoints are loaded). Drops any
        already-jitted programs so the next call builds the shard_map'd
        variant."""
        self.mesh = mesh
        self._jitted.cache_clear()

    def _build(self, _signature=None):
        """Build the jitted e2e fn (one compile per input signature via jit)."""
        num_special = self.cfg.model.units.num_special
        cdt = self.compute_dtype

        def e2e(s1_vars, voc_params, video, frames_mask, spk_emb):
            if cdt is not None:
                cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
                    lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, t)
                s1_vars, voc_params = cast(s1_vars), cast(voc_params)
                video, spk_emb = video.astype(cdt), spk_emb.astype(cdt)
            out = self.model.apply(s1_vars, video, frames_mask, spk_emb, train=False)
            units = jnp.argmax(out["unit_logits"][..., num_special:], axis=-1)
            units = jnp.where(out["mask"], units, 0)           # pad-safe codes
            wav = self.vocoder.apply({"params": voc_params}, units.astype(jnp.int32),
                                     out["mel"], spk_emb, deterministic=True)
            if self.emit_int16:
                wav = jnp.clip(wav.astype(jnp.float32) * 32767.0,
                               -32768, 32767).astype(jnp.int16)
                # serving wire mode: mel rides device->host as f16 (exact
                # enough for the artifact — log-mels span ~±12 — and halves
                # the second-largest transfer; the relay moves ~45 MB/s, so
                # at batch 4 the f32 mel alone costs ~15 ms of latency)
                mel = out["mel"].astype(jnp.float16)
            else:
                wav = wav.astype(jnp.float32)
                mel = out["mel"].astype(jnp.float32)
            return wav, units, mel, out["mask"]

        if self.mesh is None:
            return jax.jit(e2e)
        # Batch-data-parallel serving: every op in e2e is independent
        # across the batch dim, so the whole program runs unchanged on each
        # device's batch shard (params replicated, zero collectives) via
        # shard_map. Unlike bare GSPMD in_shardings, shard_map also admits
        # the fused-tail pallas_call — GSPMD cannot partition a custom
        # call, so the previous jit(in_shardings=...) form would fail to
        # compile with the kernel enabled. check_vma off: the Pallas
        # custom_vjp body doesn't carry varying-axis metadata.
        from jax.sharding import PartitionSpec as P

        d = lambda nd: P(*(("data",) + (None,) * (nd - 1)))  # noqa: E731
        return jax.jit(jax.shard_map(
            e2e, mesh=self.mesh,
            in_specs=(P(), P(), d(5), d(2), d(2)),
            out_specs=(d(2), d(2), d(3), d(2)),
            check_vma=False))

    def synthesise_batch(self, video: np.ndarray, frames_mask: np.ndarray,
                         spk_emb: np.ndarray) -> list[SynthesisResult]:
        """video: (B, T, 88, 88, 1) normalized; T should be a bucket length."""
        fn = self._jitted(None)
        b_in = video.shape[0]
        if self.mesh is not None:
            # pad the batch to a multiple of the data axis; dummy rows are
            # fully masked and sliced off below
            nd = self.mesh.shape["data"]
            pad = (-b_in) % nd
            if pad:
                z = lambda a: np.concatenate(  # noqa: E731
                    [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
                video, spk_emb = z(np.asarray(video)), z(np.asarray(spk_emb))
                frames_mask = np.concatenate(
                    [np.asarray(frames_mask),
                     np.zeros((pad,) + frames_mask.shape[1:], bool)], axis=0)
        try:
            wav, units, mel, mask = fn(self.stage1_variables,
                                       self.vocoder_params,
                                       jnp.asarray(video),
                                       jnp.asarray(frames_mask),
                                       jnp.asarray(spk_emb))
        except Exception as e:  # noqa: BLE001
            # serve-time fallback: an optimization must never kill serving
            # (VERDICT r3 next #2). If a Pallas kernel (fused vocoder tail
            # or flash attention) fails to compile on this platform (e.g.
            # the axon relay's Mosaic remote-compile helper 500s), rebuild
            # with both kernels off — same checkpoint tree, exact same
            # math — and retry once.
            fused_on = getattr(getattr(self.vocoder, "cfg", None),
                               "fused_tail_kernel", False)
            flash_on = self.model.cfg.conformer.use_flash
            if not (fused_on or flash_on):
                raise
            import dataclasses as _dc
            import logging

            logging.getLogger(__name__).warning(
                "optimized serving graph failed to compile (%s: %s) — "
                "falling back to the plain XLA path (fused_tail=%s, "
                "flash=%s -> off)", type(e).__name__, str(e)[:300],
                fused_on, flash_on)
            self.vocoder = MelCodeGenerator(
                _dc.replace(self.vocoder.cfg, fused_tail_kernel=False))
            if flash_on:
                self.model = MultiTargetModel(_dc.replace(
                    self.model.cfg, conformer=_dc.replace(
                        self.model.cfg.conformer, use_flash=False)))
            self._jitted.cache_clear()
            fn = self._jitted(None)
            wav, units, mel, mask = fn(self.stage1_variables,
                                       self.vocoder_params,
                                       jnp.asarray(video),
                                       jnp.asarray(frames_mask),
                                       jnp.asarray(spk_emb))
        wav, units, mel, mask = map(np.asarray, (wav, units, mel, mask))
        results = []
        sr = self.cfg.audio.sample_rate
        # samples per video frame = mel_per_frame (4) x hop (160) = 640 @ 16 kHz
        spf = self.cfg.model.units.mel_per_frame * self.cfg.audio.hop_length
        for i in range(b_in):                  # dummy pad rows sliced off
            n = int(frames_mask[i].sum())
            results.append(SynthesisResult(
                wav=wav[i, : n * spf],
                units=units[i, : 2 * n],
                mel=mel[i, : 4 * n],
                sample_rate=sr,
            ))
        return results

    def warmup(self, buckets=(48, 96, 160, 240, 360, 480, 600),
               batch_sizes=(1,)) -> None:
        """Precompile the e2e program for the serving buckets (production
        startup pattern — first-request latency drops from ~40 s compile to
        the steady-state ~100 ms)."""
        size = self.cfg.video.mouth_size
        for b in batch_sizes:
            for t in buckets:
                video = np.zeros((b, t, size, size, 1), np.float32)
                mask = np.zeros((b, t), bool)
                mask[:, 0] = True
                self.synthesise_batch(video, mask,
                                      np.zeros((b, 256), np.float32))

    def synthesise_file(self, video_path: str | Path, spk_emb: np.ndarray,
                        pad_to_bucket: bool = True) -> SynthesisResult:
        frames = load_video_gray(video_path)[: self.cfg.video.max_frames]
        video = prepare_video(frames, self.cfg.video.mouth_size, train=False)
        n = video.shape[0]
        t = pick_bucket(n) if pad_to_bucket else n
        vb = np.zeros((1, t, video.shape[1], video.shape[2], 1), np.float32)
        vb[0, :n, :, :, 0] = video
        mask = np.zeros((1, t), bool)
        mask[0, :n] = True
        return self.synthesise_batch(vb, mask, spk_emb[None].astype(np.float32))[0]
