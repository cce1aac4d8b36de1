#!/usr/bin/env python
"""Easi3R-SLAM (TPU) entry point — experimental, mirrors the reference
`main_easier_slam.py` (marked "Future Work" in the reference README; its
Easi3R submodule is empty in the snapshot, SURVEY.md §0).

Structurally identical to the dual-model dynamic pipeline: Easi3R (a DUSt3R
variant with attention-based dynamic reweighting) provides pointmaps X/C and
MASt3R provides descriptors D/Q. Until Easi3R weights are converted, this
shares main_monster_slam's dual-decode path with a DUSt3R-architecture
checkpoint passed via --easi3r-checkpoint.
"""

import sys

from main_monster_slam import main

if __name__ == "__main__":
    # Accept --easi3r-checkpoint as an alias for --monst3r-checkpoint
    sys.argv = [
        a.replace("--easi3r-checkpoint", "--monst3r-checkpoint") for a in sys.argv
    ]
    main()
