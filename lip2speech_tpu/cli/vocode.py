"""Vocoder inference CLI: vocoder-dir -> pred_wav/*.wav + RTF.

Rebuild of reference multi_input_vocoder/inference.py:53-259 (vocoder.sh):
reads the stage-2 input tree (units/mel/spk_emb manifests), synthesizes
16 kHz waveforms batched per length bucket, writes int16 WAVs, prints RTF.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from lip2speech_tpu.core.config import PipelineConfig, preset
from lip2speech_tpu.data.stage2 import Stage2Dataset
from lip2speech_tpu.utils.audio_io import write_wav


def run_vocoder(cfg: PipelineConfig, gen_params: dict,
                tsv_path, unt_path, out_dir, root_override=None) -> dict:
    import jax.numpy as jnp

    from lip2speech_tpu.models.vocoder import MelCodeGenerator

    gen = MelCodeGenerator(cfg.vocoder)
    ds = Stage2Dataset(tsv_path, unt_path, cfg.vocoder,
                       root_override=root_override, train=False)
    out_dir = Path(out_dir)
    total_audio_s = 0.0
    t0 = time.time()
    for i in range(len(ds)):
        s = ds.load(i)
        wav = gen.apply({"params": gen_params}, jnp.asarray(s.code)[None],
                        jnp.asarray(s.mel)[None], jnp.asarray(s.spk_emb)[None],
                        deterministic=True)
        wav = np.asarray(wav)[0]
        write_wav(out_dir / "pred_wav" / f"{s.uid}.wav", wav, cfg.audio.sample_rate)
        total_audio_s += len(wav) / cfg.audio.sample_rate
    elapsed = time.time() - t0
    rtf = elapsed / max(total_audio_s, 1e-9)
    return {"n_utts": len(ds), "audio_s": round(total_audio_s, 2),
            "elapsed_s": round(elapsed, 2), "rtf": round(rtf, 5)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="g_* orbax dir or torch g_######## file")
    p.add_argument("--tsv", required=True)
    p.add_argument("--unt", required=True)
    p.add_argument("--root")
    p.add_argument("--out-dir", required=True)
    args = p.parse_args()

    cfg = preset("multi_target")
    if Path(args.checkpoint).is_file():
        from lip2speech_tpu.convert.torch_to_jax import (
            convert_vocoder_generator, load_torch_state)

        gen_params = convert_vocoder_generator(load_torch_state(args.checkpoint),
                                               cfg.vocoder)
    else:
        from lip2speech_tpu.train.checkpoint import load_pytree

        gen_params = load_pytree(args.checkpoint)["generator"]
    stats = run_vocoder(cfg, gen_params, args.tsv, args.unt, args.out_dir, args.root)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
