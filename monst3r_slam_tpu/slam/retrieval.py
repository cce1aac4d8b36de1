"""Loop-closure retrieval: HOW/ASMK over projected encoder features.

Self-contained reimplementation of the reference retrieval stack:
  * feature head (`mast3r/retrieval/model.py:55-160` Whitener / projector /
    l2-norm attention / how_select_local) as pure-JAX functions — runs on TPU
    right after the encoder, reusing the cached per-frame features;
  * ASMK with binarized descriptors (`asmk/asmk/kernel.py`,
    `inverted_file.py`, Cython `hamming.pyx` -> numpy popcount) and the
    incremental IVF + query-then-add logic of
    `mast3r_slam/retrieval_database.py:9-166` — host-side numpy, off the
    device hot path, exactly like the reference keeps it off-GPU.

Default parameters follow `mast3r/retrieval/processor.py:91-99`: 64k
codebook, binary kernel, multiple-assignment 1 (build) / 5 (query),
similarity alpha 3.0, threshold 0.0, no idf.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Feature head (device)
# ---------------------------------------------------------------------------


def whiten(p, x: jax.Array) -> jax.Array:
    """Whitener (retrieval/model.py:55-79): center + PCA, optional l2norm."""
    y = (x - p["m"]) @ p["p"]
    if p.get("l2norm", False):
        y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    return y


def projector(p, x: jax.Array) -> jax.Array:
    """MLP projector (retrieval/model.py:144-157): (Linear, LN, GELU)* Linear."""
    for layer in p["hidden"]:
        x = x @ layer["w"] + layer["b"]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * layer["ln_w"] + layer["ln_b"]
        x = jax.nn.gelu(x, approximate=False)
    x = x @ p["out"]["w"] + p["out"]["b"]
    return x


def prep_features(params, backbone_feat: jax.Array, nfeat: int = 300) -> jax.Array:
    """Encoder features (B, N, D) -> top-`nfeat` whitened local features.

    Mirrors RetrievalDatabase.prep_features (retrieval_database.py:25-41):
    prewhiten -> projector (+residual) -> l2-norm attention -> postwhiten ->
    top-k by attention.
    """
    x = whiten(params["prewhiten"], backbone_feat)
    proj = projector(params["projector"], x)
    if params.get("residual", False):
        proj = proj + x
    attention = jnp.linalg.norm(proj, axis=-1)  # featweights='l2norm'
    white = whiten(params["postwhiten"], proj)
    k = min(nfeat, white.shape[1])
    _, top_idx = jax.lax.top_k(attention, k)
    return jnp.take_along_axis(white, top_idx[..., None], axis=1)


def init_retrieval_params(key, dim: int, hdims=(1024,), residual: bool = False):
    """Random init (for tests / untrained operation)."""
    ks = jax.random.split(key, 2 * len(hdims) + 1)
    hidden = []
    d = dim
    for i, h in enumerate(hdims[:-1]):
        hidden.append(
            {
                "w": jax.random.normal(ks[i], (d, h)) / np.sqrt(d),
                "b": jnp.zeros((h,)),
                "ln_w": jnp.ones((h,)),
                "ln_b": jnp.zeros((h,)),
            }
        )
        d = h
    out_dim = hdims[-1] if hdims else dim
    params = {
        "prewhiten": {"m": jnp.zeros((dim,)), "p": jnp.eye(dim)},
        "projector": {
            "hidden": hidden,
            "out": {
                "w": jax.random.normal(ks[-1], (d, out_dim)) / np.sqrt(d),
                "b": jnp.zeros((out_dim,)),
            },
        },
        "postwhiten": {"m": jnp.zeros((out_dim,)), "p": jnp.eye(out_dim)},
        "residual": residual,
    }
    return params


def retrieval_params_from_checkpoint(path: str, dim: int = 1024):
    """Convert the reference retrieval checkpoint
    (`MASt3R_..._retrieval_trainingfree.pth`) to the JAX param pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["model"].items() if not k.startswith("backbone")}
    args = ckpt["args"]
    hdims = list(map(int, args.hdims.split("_"))) if len(args.hdims) > 0 else []

    hidden = []
    # torch projector is an nn.Sequential: Linear, LayerNorm, GELU, ..., Linear
    n_hidden = max(0, len(hdims) - 1)
    for i in range(n_hidden):
        li = 3 * i
        hidden.append(
            {
                "w": sd[f"projector.{li}.weight"].T,
                "b": sd[f"projector.{li}.bias"],
                "ln_w": sd[f"projector.{li + 1}.weight"],
                "ln_b": sd[f"projector.{li + 1}.bias"],
            }
        )
    out_i = 3 * n_hidden
    params = {
        "prewhiten": {
            "m": sd["prewhiten.m"].reshape(-1).astype(np.float32),
            "p": sd["prewhiten.p"].astype(np.float32),
        },
        "projector": {
            "hidden": hidden,
            "out": {
                "w": sd[f"projector.{out_i}.weight"].T,
                "b": sd[f"projector.{out_i}.bias"],
            },
        },
        "postwhiten": {
            "m": sd["postwhiten.m"].reshape(-1).astype(np.float32),
            "p": sd["postwhiten.p"].astype(np.float32),
        },
        "residual": bool(getattr(args, "residual", False)),
    }
    return jax.tree.map(jnp.asarray, params), int(args.nfeat)


# ---------------------------------------------------------------------------
# ASMK (host, numpy)
# ---------------------------------------------------------------------------

_POPCOUNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def binarize_and_pack(x: np.ndarray) -> np.ndarray:
    """Sign-binarize rows and pack to uint8 (hamming.pyx:15-28 equivalent)."""
    bits = (x > 0).astype(np.uint8)
    return np.packbits(bits, axis=-1)


def hamming_sim_packed(q: np.ndarray, db: np.ndarray, dim: int) -> np.ndarray:
    """Similarity in [-1, 1] from normalized hamming distance
    (kernel.py:60-64: sim = 1 - 2 * hdist / dim)."""
    xor = np.bitwise_xor(q[None, :], db)
    hdist = _POPCOUNT[xor].sum(axis=-1)
    return 1.0 - 2.0 * hdist / dim


class ASMKDatabase:
    """Incremental binary-ASMK inverted file (query-then-add per keyframe).

    API mirrors RetrievalDatabase.update (retrieval_database.py:43-94):
    `update(feat, add_after_query, k, min_thresh)` returns the top-k matched
    keyframe indices above threshold.
    """

    def __init__(
        self,
        centroids: Optional[np.ndarray],  # (n_words, d); None = bootstrap
        alpha: float = 3.0,
        similarity_threshold: float = 0.0,
        ma_build: int = 1,
        ma_query: int = 5,
        n_words: int = 1024,
        dim: int = 64,
        bootstrap_frames: int = 5,
        use_idf: bool = False,
    ):
        """With `centroids=None` the codebook is BOOTSTRAPPED: features of
        the first `bootstrap_frames` keyframes are buffered, k-means fits the
        codebook on them, and the buffered frames are then indexed. A random
        Gaussian codebook (the previous no-checkpoint fallback) leaves most
        cells empty for in-domain features — quantization collapses and
        retrieval scores are noise; fitting on the sequence's own features
        restores discrimination without any pretrained pickle."""
        self.alpha = alpha
        self.similarity_threshold = similarity_threshold
        self.ma_build = ma_build
        self.ma_query = ma_query
        self.bootstrap_frames = bootstrap_frames
        # Optional IDF weighting (asmk inverted_file idf option; the
        # reference's processor runs without it, processor.py:91-97):
        # down-weights "stopword" visual words that appear in most images.
        # Incremental DB, so idf and image norms are recomputed per query
        # from the current word->image counts.
        self.use_idf = use_idf
        self._pending: List[np.ndarray] = []
        if centroids is not None:
            self._set_centroids(np.asarray(centroids, np.float32))
        else:
            self.centroids = None
            self.n_words, self.dim = n_words, dim
        self.norm_factor = np.zeros(0)
        self.kf_counter = 0

    @classmethod
    def from_config(cls, config: dict) -> "ASMKDatabase":
        """Bootstrap-mode database with the codebook policy read from the
        run config (`retrieval.n_words`, `retrieval.bootstrap_frames`,
        `retrieval.use_idf`) — the no-pretrained-checkpoint path of the
        reference's processor (processor.py:91-97 loads a pretrained 64k
        codebook; without one the codebook is k-means-fit on the first
        keyframes' own features). Recall ablation on oracle features at
        5120 distractors (scripts/ablate_retrieval.py, NOTES_r5): the
        bootstrap regime is sample-limited — bootstrap_frames*patches
        features upper-bound useful words — so defaults balance cell
        occupancy against quantization collapse."""
        r = config.get("retrieval", {}) if config else {}
        return cls(
            None,
            n_words=int(r.get("n_words", 1024)),
            bootstrap_frames=int(r.get("bootstrap_frames", 5)),
            use_idf=bool(r.get("use_idf", False)),
        )

    def _set_centroids(self, centroids: np.ndarray):
        self.centroids = np.asarray(centroids, np.float32)
        self.cent_sq = (self.centroids**2).sum(1)
        self.n_words, self.dim = self.centroids.shape
        self.ivf_vecs: List[Optional[np.ndarray]] = [None] * self.n_words
        self.ivf_imids: List[Optional[np.ndarray]] = [None] * self.n_words
        self.counts = np.zeros(self.n_words, np.int64)
        self.word_imgs = np.zeros(self.n_words, np.int64)  # images per word
        self.image_words: List[np.ndarray] = []  # words per image (for idf norms)

    def quantize(self, vecs: np.ndarray, k: int) -> np.ndarray:
        """Top-k nearest centroids by L2 (retrieval_database.py:96-105)."""
        d2 = (vecs**2).sum(1)[:, None] + self.cent_sq[None, :] - 2.0 * vecs @ self.centroids.T
        if k == 1:
            return np.argmin(d2, axis=1)[:, None]
        idx = np.argpartition(d2, k, axis=1)[:, :k]
        row = np.arange(vecs.shape[0])[:, None]
        order = np.argsort(d2[row, idx], axis=1)
        return idx[row, order]

    def _aggregate(self, vecs: np.ndarray, word_ids: np.ndarray):
        """Per-word residual aggregation + binarization (kernel.py:26-38)."""
        unique = np.unique(word_ids)
        ades = np.empty((unique.shape[0], self.dim), np.float32)
        for i, word in enumerate(unique):
            members = (word_ids == word).any(axis=1)
            ades[i] = (vecs[members] - self.centroids[word]).sum(0)
        return binarize_and_pack(ades), unique

    def _idf(self) -> np.ndarray:
        """Per-word idf² weights from current word->image counts
        (asmk inverted_file idf semantics; squared ln, smoothed)."""
        N = max(self.kf_counter, 1)
        return np.log((N + 1.0) / (self.word_imgs + 1.0)) ** 2

    def query(self, vecs: np.ndarray) -> np.ndarray:
        """Scores against all stored images (inverted_file.py:86-107;
        optional idf weighting, see __init__)."""
        words = self.quantize(vecs, self.ma_query)
        agg, unique = self._aggregate(vecs, words)
        scores = np.zeros(self.kf_counter)
        if self.use_idf:
            idf = self._idf()
            # image norms recomputed under current idf so cosine-style
            # normalization stays consistent as the DB grows
            norm_factor = np.asarray(
                [max(idf[w].sum(), 1e-12) for w in self.image_words]
            )
        else:
            idf = None
            norm_factor = self.norm_factor
        q_norm = 0.0
        for qvec, word in zip(agg, unique):
            w_weight = 1.0 if idf is None else float(idf[word])
            q_norm += w_weight
            if self.ivf_imids[word] is None or w_weight <= 0.0:
                continue
            n = self.counts[word]
            sim = hamming_sim_packed(qvec, self.ivf_vecs[word][:n], self.dim)
            imids = self.ivf_imids[word][:n]
            mask = sim >= self.similarity_threshold
            sim = w_weight * np.power(sim[mask], self.alpha)
            imids = imids[mask]
            sim /= np.sqrt(norm_factor[imids])
            np.add.at(scores, imids, sim)
        return scores / np.sqrt(max(q_norm, 1e-12))

    def add(self, vecs: np.ndarray):
        words = self.quantize(vecs, self.ma_build)
        agg, unique = self._aggregate(vecs, words)
        imid = self.kf_counter
        self.norm_factor = np.concatenate([self.norm_factor, np.zeros(1)])
        for vec, word in zip(agg, unique):
            n = self.counts[word]
            if self.ivf_vecs[word] is None:
                self.ivf_vecs[word] = np.zeros((10,) + vec.shape, vec.dtype)
                self.ivf_imids[word] = np.zeros(10, np.int64)
            elif n >= self.ivf_vecs[word].shape[0]:
                new = int(np.ceil(self.ivf_vecs[word].shape[0] * 1.5))
                self.ivf_vecs[word] = np.resize(self.ivf_vecs[word], (new,) + vec.shape)
                self.ivf_imids[word] = np.resize(self.ivf_imids[word], new)
            self.ivf_vecs[word][n] = vec
            self.ivf_imids[word][n] = imid
            self.counts[word] += 1
            self.norm_factor[imid] += 1.0
            self.word_imgs[word] += 1
        self.image_words.append(unique.copy())
        self.kf_counter += 1

    def update(self, feat: np.ndarray, add_after_query: bool, k: int, min_thresh: float = 0.0):
        """Query top-k matches then optionally insert (retrieval_database.py:43)."""
        if self.centroids is None:
            # Bootstrap phase: buffer, no retrieval yet (the SLAM loop only
            # needs retrieval once enough keyframes exist to close loops).
            feat = np.asarray(feat, np.float32).reshape(feat.shape[0], -1)
            if add_after_query:
                self._pending.append(feat)
                if len(self._pending) >= self.bootstrap_frames:
                    pool = np.concatenate(self._pending)
                    self._set_centroids(kmeans_codebook(pool, self.n_words))
                    pending, self._pending = self._pending, []
                    for f in pending:
                        self.add(f)
            return []
        feat = np.asarray(feat, np.float32).reshape(-1, self.centroids.shape[1])
        topk: List[int] = []
        if self.kf_counter > 0:
            scores = self.query(feat)
            order = np.argsort(-scores)[: min(k, self.kf_counter)]
            topk = [int(i) for i in order if scores[i] > min_thresh]
        if add_after_query:
            self.add(feat)
        return topk


def make_random_codebook(key, n_words: int, dim: int) -> np.ndarray:
    """Untrained fallback codebook (no pretrained pickle in this image)."""
    return np.asarray(jax.random.normal(key, (n_words, dim)))


def kmeans_codebook(
    feats: np.ndarray, n_words: int, iters: int = 15, seed: int = 0
) -> np.ndarray:
    """Plain-numpy Lloyd k-means for codebook bootstrapping.

    feats: (n, d). Initialized from a random sample (the standard asmk
    training recipe is k-means over local descriptors; this is the
    sequence-local equivalent)."""
    feats = np.asarray(feats, np.float32)
    n, d = feats.shape
    rng = np.random.default_rng(seed)
    k = min(n_words, n)
    cent = feats[rng.choice(n, k, replace=False)].copy()
    for _ in range(iters):
        d2 = (
            (feats**2).sum(1)[:, None]
            + (cent**2).sum(1)[None, :]
            - 2.0 * feats @ cent.T
        )
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            members = feats[assign == j]
            if len(members):
                cent[j] = members.mean(0)
            else:  # re-seed empty cell on a random point
                cent[j] = feats[rng.integers(n)]
    if k < n_words:  # pad (degenerate tiny input): duplicate with jitter
        extra = cent[rng.integers(k, size=n_words - k)]
        extra = extra + 1e-3 * rng.standard_normal(extra.shape).astype(np.float32)
        cent = np.concatenate([cent, extra])
    return cent


def load_codebook(path: str) -> np.ndarray:
    """Load the reference codebook pickle (asmk cache format)."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, dict):
        for key in ("centroids", "codebook"):
            if key in data:
                data = data[key]
                break
        if isinstance(data, dict) and "state" in data:
            data = data["state"]["centroids"]
    return np.asarray(data, np.float32)
