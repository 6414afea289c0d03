"""Speech-unit extraction pipeline: wav -> HuBERT layer-6 -> k-means -> .unt.

Rebuild of the reference's three-script flow (SURVEY.md §2.2 Clustering):
  dump_hubert_feature.py  -> dump_features()
  learn_kmeans.py         -> learn_units()
  dump_km_label.py        -> label_manifest()
plus the serving-time quantize_with_kmeans path (extract_speech_units.sh).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.data.manifest import Utterance, read_manifest, write_units
from lip2speech_tpu.models.hubert import HubertBase
from lip2speech_tpu.ops.kmeans import kmeans_apply, kmeans_fit
from lip2speech_tpu.utils.audio_io import read_wav

MAX_CHUNK = 1_600_000  # samples per forward chunk (reference HubertFeatureReader)


class HubertFeatureExtractor:
    def __init__(self, params: dict, layer: int = 6):
        self.model = HubertBase()
        self.params = params
        self.layer = layer

    def features(self, wav: np.ndarray) -> np.ndarray:
        """(T_samples,) -> (T/320, 768) layer-6 features, chunked like the
        reference reader (<= 1.6 M samples per forward)."""
        outs = []
        for i in range(0, len(wav), MAX_CHUNK):
            chunk = jnp.asarray(wav[i : i + MAX_CHUNK], jnp.float32)[None]
            out = self.model.apply({"params": self.params}, chunk,
                                   output_layer=self.layer)
            outs.append(np.asarray(out[0]))
        return np.concatenate(outs) if outs else np.zeros((0, 768), np.float32)


def dump_features(extractor: HubertFeatureExtractor,
                  utts: Iterable[Utterance]) -> list[np.ndarray]:
    feats = []
    for utt in utts:
        wav, sr = read_wav(utt.audio_path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        feats.append(extractor.features(wav))
    return feats


def learn_units(features: list[np.ndarray], n_clusters: int = 200,
                seed: int = 0, n_steps: int = 500) -> np.ndarray:
    """All dumped features -> (K, D) centroids (learn_kmeans equivalent)."""
    return kmeans_fit(np.concatenate(features), n_clusters, seed=seed, n_steps=n_steps)


def label_manifest(extractor: HubertFeatureExtractor, centroids: np.ndarray,
                   tsv_path: str | Path, unt_path: str | Path,
                   root_override=None) -> None:
    """Write the .unt label file parallel to a TSV manifest."""
    utts = read_manifest(tsv_path, root_override=root_override)
    rows = []
    for utt in utts:
        wav, _ = read_wav(utt.audio_path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        feats = extractor.features(wav)
        rows.append(kmeans_apply(feats, centroids))
    write_units(unt_path, rows)
