"""Bootstrap-codebook recall ablation at >=5k distractors (VERDICT r4 #8).

The reference ships a pretrained 64k-word codebook (processor.py:91-97);
without a checkpoint this framework k-means-fits the codebook on the first
`bootstrap_frames` keyframes' own features. The fit only ever sees
bootstrap_frames * tokens_per_frame samples (5 * 768 = 3840 in production),
so the useful word count is sample-limited: words beyond the sample count
are jitter-padded duplicates (kmeans_codebook).

This script sweeps n_words x bootstrap_samples on the synthetic scene
corpus (tests/test_retrieval.py::_scene_corpus semantics) with >=5120
distractor images in the database, and prints precision@1 / recall@3 over
held-out queries. The table justifies config/base.yaml's retrieval.n_words
default. Run: python scripts/ablate_retrieval.py  (pure numpy, ~minutes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from monst3r_slam_tpu.slam import retrieval

N_QUERY = int(os.environ.get("N_QUERY", "256"))
N_DISTRACT = int(os.environ.get("N_DISTRACT", "5120"))
NFEAT = int(os.environ.get("NFEAT", "128"))  # features per image
DIM = 64
N_STOP = 16  # shared "stopword" features per image
NOISE = 0.25


def corpus(seed):
    n_scenes = N_QUERY + N_DISTRACT
    rng = np.random.default_rng(seed)
    bases = rng.standard_normal((n_scenes, NFEAT - N_STOP, DIM)).astype(np.float32)
    stop = rng.standard_normal((N_STOP, DIM)).astype(np.float32)

    def view(s, key):
        r = np.random.default_rng((hash((seed, s, key))) % 2**32)
        f = bases[s] + NOISE * r.standard_normal(bases[s].shape)
        g = stop + NOISE * r.standard_normal(stop.shape)
        return np.concatenate([f, g]).astype(np.float32)

    return view


def evaluate(n_words, bootstrap_frames, seed=0):
    view = corpus(seed)
    db = retrieval.ASMKDatabase(
        None, n_words=n_words, bootstrap_frames=bootstrap_frames
    )
    n_scenes = N_QUERY + N_DISTRACT
    for s in range(n_scenes):
        db.update(view(s, 0), add_after_query=True, k=3)
    p1 = r3 = 0
    for s in range(N_QUERY):
        top = db.update(view(s, 1), add_after_query=False, k=3)
        p1 += bool(top) and top[0] == s
        r3 += s in top[:3]
    return p1 / N_QUERY, r3 / N_QUERY


def main():
    print(
        f"db_images={N_QUERY + N_DISTRACT} feats/img={NFEAT} "
        f"queries={N_QUERY} (production: 768 tokens/keyframe -> "
        f"5 bootstrap frames = 3840 k-means samples)"
    )
    print(f"{'n_words':>8} {'boot_frames':>12} {'samples':>8} "
          f"{'p@1':>6} {'r@3':>6} {'secs':>6}")
    for n_words in (512, 1024, 2048, 4096):
        for bf in (5, 15, 30):
            samples = bf * NFEAT
            t0 = time.time()
            p1, r3 = evaluate(n_words, bf)
            print(
                f"{n_words:>8} {bf:>12} {samples:>8} "
                f"{p1:>6.3f} {r3:>6.3f} {time.time()-t0:>6.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
