"""Pair-file generation — rebuild of src_deformable/utils/create_pairs.py.

Produces the ``from,to`` pair CSVs the dataset consumes. Behavior parity:

- ``make_pair_nonvid`` (create_pairs.py:12-24): fashion-style — the person id
  is the first ``_``-token of the image name; pairs are all ordered
  permutations of that person's images.
- ``make_pairs`` (create_pairs.py:26-43): video-style (h36m) — person id is
  everything up to the last ``_``-token; pairs are frame i → i+2 within each
  sequence.
- ``make_pairs_iterative`` (create_pairs.py:45-77): frame sequences of length
  ``frame_diff+1``, one start every 10 frames, stride 2 between entries.
- ``make_pairs_restricted`` (create_pairs.py:79-103): like ``make_pairs`` but
  only action classes ``act_NN`` with NN >= 14 (walking types).
- ``write_pair_files``: the script's __main__ (create_pairs.py:105-128) —
  pose_dim 16 → make_pairs, else make_pair_nonvid; subsample with
  ``random_state=0``.
"""

from __future__ import annotations

import re
from itertools import permutations

import pandas as pd


def _person_ids(df: pd.DataFrame, tokens: slice) -> pd.Series:
    return df["name"].map(lambda n: "_".join(n.split("_")[tokens]))


def make_pair_nonvid(df: pd.DataFrame) -> pd.DataFrame:
    """All ordered same-person permutations (fashion, pose_dim 18)."""
    df = df.copy()
    df["person"] = _person_ids(df, slice(0, 1))
    fr, to = [], []
    for person in pd.unique(df["person"]):
        names = list(df[df["person"] == person]["name"])
        pairs = list(zip(*permutations(names, 2)))
        if pairs:
            fr += list(pairs[0])
            to += list(pairs[1])
    return pd.DataFrame({"from": fr, "to": to})


def make_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Frame i → i+2 within each video sequence (h36m, pose_dim 16)."""
    df = df.copy()
    df["person"] = _person_ids(df, slice(None, -1))
    fr, to = [], []
    for person in pd.unique(df["person"]):
        names = list(df[df["person"] == person]["name"])
        for i in range(len(names)):
            if i + 2 < len(names):
                fr.append(names[i])
                to.append(names[i + 2])
    return pd.DataFrame({"from": fr, "to": to})


def make_pairs_iterative(df: pd.DataFrame, frame_diff: int = 10) -> pd.DataFrame:
    """Sequences seq0..seq<frame_diff> for iterative testing."""
    df = df.copy()
    df["person"] = _person_ids(df, slice(None, -1))
    seq = [[] for _ in range(frame_diff + 1)]
    for person in pd.unique(df["person"]):
        names = list(df[df["person"] == person]["name"])
        num_rows = len(names)
        for i in range(num_rows):
            if i % 10 != 0:
                continue
            if i + 2 * frame_diff < num_rows:
                seq[0].append(names[i])
                for j in range(1, frame_diff + 1):
                    seq[j].append(names[i + j * 2])
    return pd.DataFrame({f"seq{j}": seq[j] for j in range(frame_diff + 1)})


def make_pairs_restricted(df: pd.DataFrame) -> pd.DataFrame:
    """Like make_pairs but only walking action classes (act id >= 14)."""
    df = df.copy()
    df["person"] = _person_ids(df, slice(None, -1))
    fr, to = [], []
    for person in pd.unique(df["person"]):
        m = re.search(r"act_([0-9]{2})", person)
        if m is None or int(m.groups()[0]) < 14:
            continue
        names = list(df[df["person"] == person]["name"])
        for i in range(len(names)):
            if i + 2 < len(names):
                fr.append(names[i])
                to.append(names[i + 2])
    return pd.DataFrame({"from": fr, "to": to})


def build_pairs(annotations: pd.DataFrame, pose_dim: int,
                max_pairs: int | None = None) -> pd.DataFrame:
    """pose_dim-dispatched pair construction + seeded subsampling."""
    df = annotations.reset_index() if annotations.index.name == "name" \
        else annotations
    pairs = make_pairs(df) if pose_dim == 16 else make_pair_nonvid(df)
    if max_pairs is not None:
        pairs = pairs.sample(n=min(max_pairs, len(pairs)), replace=False,
                             random_state=0)
    return pairs


def write_pair_files(opt) -> tuple[int, int]:
    """The create_pairs __main__ flow: write train and test pair CSVs.

    ``opt`` needs: annotations_file_{train,test}, pairs_file_{train,test},
    pose_dim, images_for_train, images_for_test. Returns pair counts.
    """
    counts = []
    for split in ("train", "test"):
        ann = pd.read_csv(getattr(opt, f"annotations_file_{split}"), sep=":")
        limit = getattr(opt, f"images_for_{split}")
        pairs = build_pairs(ann, opt.pose_dim, limit)
        print(f"Compute pair dataset for {split}... "
              f"Number of pairs: {len(pairs)}")
        if getattr(opt, "checkMode", 0):
            # the baseline tree's overfit-smoke CSVs: a seeded 4000-pair
            # sample written to the -check path instead of the full file
            # (src_baseline/utils/create_pairs.py:114-127)
            sampled = pairs.sample(n=min(4000, len(pairs)), replace=False,
                                   random_state=0)
            print(f"Number of pairs: {len(sampled)}")
            sampled.to_csv(getattr(opt, f"pairs_file_{split}_check"),
                           index=False)
            counts.append(len(sampled))
            continue
        pairs.to_csv(getattr(opt, f"pairs_file_{split}"), index=False)
        # the deformable-tree dataset reads the -interpol pairs files
        # (PoseTransfer_Dataset.py:30-31); write them too so a fresh
        # directory is immediately trainable.
        pairs.to_csv(getattr(opt, f"pairs_file_{split}_interpol"), index=False)
        if getattr(opt, "write_iterative", False) and opt.pose_dim == 16:
            it = make_pairs_iterative(ann, opt.frame_diff)
            it.to_csv(getattr(opt, f"pairs_file_{split}_iterative"),
                      index=False)
        counts.append(len(pairs))
    return tuple(counts)
