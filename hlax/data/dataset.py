"""Longitudinal dataset wrapper + subject-major padded batching.

Replaces the reference's Dataset/Sampler stack
(/root/reference/dataset_def.py:9-92, utils.py:10-97):

  * ``SubjectSampler`` / ``VaryingLengthSubjectSampler`` /
    ``VaryingLengthBatchSampler`` become one batcher that groups whole
    subjects and pads each subject to T_max — ragged subjects turn into
    static [S, T_max] shapes with a validity mask (one jit compilation,
    no per-batch shape churn).
  * Label-column reorder for Health-MNIST (dataset_def.py:46-47): when
    n_variables == 1296 the label CSV columns
    [subject, digit, angle, disease, disease_time, gender, time_age, location]
    are reordered to [time_age, disease_time, subject, gender, disease,
    location] so id_covariate=2 is the subject.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, Optional

import numpy as np
import pandas as pd

from hlax.data.reader import HeterogeneousData, read_data

HEALTH_MNIST_LABEL_ORDER = [6, 4, 0, 5, 3, 7]


@dataclasses.dataclass
class LongitudinalDataset:
    het: HeterogeneousData
    labels: np.ndarray          # [N, Q] float64 (NaN -> 0, dataset_def.py:84)
    id_covariate: int
    conv: bool = True
    use_ranges: bool = False

    # derived
    subject_ids: np.ndarray = dataclasses.field(init=False)
    subject_start: np.ndarray = dataclasses.field(init=False)
    subject_end: np.ndarray = dataclasses.field(init=False)
    T_max: int = dataclasses.field(init=False)

    def __post_init__(self):
        ids = self.labels[:, self.id_covariate]
        # subjects in order of first appearance; rows per subject contiguous
        # (VaryingLengthSubjectSampler semantics, utils.py:53-75)
        _, first = np.unique(ids, return_index=True)
        order = np.sort(first)
        self.subject_ids = ids[order]
        starts = list(order)
        ends = starts[1:] + [len(ids)]
        self.subject_start = np.asarray(starts)
        self.subject_end = np.asarray(ends)
        self.T_max = int((self.subject_end - self.subject_start).max())

    def __len__(self):
        return self.het.n_samples

    @property
    def P(self) -> int:
        return len(self.subject_ids)

    @property
    def Q(self) -> int:
        return self.labels.shape[1]

    @property
    def layout(self):
        return self.het.layout


def load_dataset(
    root_dir: str,
    data_file: str,
    label_file: str,
    mask_file: Optional[str],
    types_file: str,
    true_miss_file: Optional[str] = None,
    range_file: Optional[str] = None,
    id_covariate: int = 2,
    logvar_network: bool = False,
    conv: bool = True,
    use_ranges: bool = False,
) -> LongitudinalDataset:
    """File-based constructor mirroring HeterogeneousHealthMNISTDataset."""
    j = lambda p: os.path.join(root_dir, p) if p else None
    het = read_data(j(data_file), j(mask_file), j(true_miss_file),
                    j(types_file), j(range_file), logvar_network)
    labels = pd.read_csv(j(label_file), header=0)
    if het.n_variables == 1296:
        labels = labels[labels.columns.values[np.array(HEALTH_MNIST_LABEL_ORDER)]]
    lab = np.nan_to_num(labels.to_numpy(dtype=np.float64))
    het.labels = lab
    return LongitudinalDataset(het=het, labels=lab, id_covariate=id_covariate,
                               conv=conv, use_ranges=use_ranges)


def _pad_rows(ds: LongitudinalDataset, subj_idx: np.ndarray, t_max: int
              ) -> Dict[str, np.ndarray]:
    """Gather+pad rows of the given subjects into [S*T_max, ...] arrays."""
    het = ds.het
    s_count = len(subj_idx)
    n_exp, n_raw, n_theta = het.data.shape[1], het.mask.shape[1], het.theta_mask.shape[1]
    q = ds.labels.shape[1]
    B = s_count * t_max
    out = {
        "data": np.zeros((B, n_exp)),
        "mask": np.zeros((B, n_raw)),
        "theta_mask": np.zeros((B, n_theta)),
        "labels": np.zeros((B, q)),
        "valid": np.zeros((s_count, t_max)),
        "idx": np.full((B,), -1, dtype=np.int64),
    }
    for i, s in enumerate(subj_idx):
        if s < 0:
            continue   # padding subject
        a, b = ds.subject_start[s], ds.subject_end[s]
        t = b - a
        r0 = i * t_max
        out["data"][r0:r0 + t] = het.data[a:b]
        out["mask"][r0:r0 + t] = het.mask[a:b]
        out["theta_mask"][r0:r0 + t] = het.theta_mask[a:b]
        out["labels"][r0:r0 + t] = ds.labels[a:b]
        out["valid"][i, :t] = 1.0
        out["idx"][r0:r0 + t] = np.arange(a, b)
    return out


def subject_batches(
    ds: LongitudinalDataset,
    subjects_per_batch: int,
    rng: Optional[np.random.Generator] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield shuffled whole-subject padded batches; the last batch is padded
    with empty subjects so every batch has identical shapes (one jit)."""
    order = np.arange(ds.P)
    if rng is not None:
        rng.shuffle(order)
    for i in range(0, ds.P, subjects_per_batch):
        chunk = order[i:i + subjects_per_batch]
        if len(chunk) < subjects_per_batch:
            chunk = np.concatenate(
                [chunk, -np.ones(subjects_per_batch - len(chunk), np.int64)])
        yield _pad_rows(ds, chunk, ds.T_max)


def full_padded(ds: LongitudinalDataset, t_max: Optional[int] = None
                ) -> Dict[str, np.ndarray]:
    """Whole dataset as one padded subject-major batch (for validation /
    prediction paths that the reference runs full-set)."""
    return _pad_rows(ds, np.arange(ds.P), t_max or ds.T_max)


def n_batches(ds: LongitudinalDataset, subjects_per_batch: int) -> int:
    return (ds.P + subjects_per_batch - 1) // subjects_per_batch


# ---------------------------------------------------------------------------
# device-resident staging: upload the padded dataset ONCE, gather batches
# on-device from a tiny per-step subject-index array.  Replaces per-step
# host->device transfer (the reference re-ships every batch through its
# DataLoader; over a remote-device link that dominates step time).
# ---------------------------------------------------------------------------

def stage_dataset(ds: LongitudinalDataset, dtype):
    """Upload the whole dataset as padded [P, T_max, ...] device arrays."""
    import jax.numpy as jnp

    full = _pad_rows(ds, np.arange(ds.P), ds.T_max)
    P, T = ds.P, ds.T_max
    def shape3(a):
        return a.reshape(P, T, -1)
    return {
        "data": jnp.asarray(shape3(full["data"]), dtype),
        "mask": jnp.asarray(shape3(full["mask"]), dtype),
        "theta_mask": jnp.asarray(shape3(full["theta_mask"]), dtype),
        "labels": jnp.asarray(shape3(full["labels"]), dtype),
        "valid": jnp.asarray(full["valid"], dtype),
    }


def gather_batch(staged, subj_idx):
    """On-device batch gather: subj_idx [S] (−1 = padding subject) ->
    flat-row batch dict matching ``subject_batches`` output."""
    import jax.numpy as jnp

    idx = jnp.asarray(subj_idx)
    safe = jnp.maximum(idx, 0)
    alive = (idx >= 0).astype(staged["valid"].dtype)[:, None]
    S = idx.shape[0]
    T = staged["valid"].shape[1]
    out = {}
    for k in ("data", "mask", "theta_mask", "labels"):
        v = staged[k][safe] * alive[:, :, None]
        out[k] = v.reshape(S * T, -1)
    out["valid"] = staged["valid"][safe] * alive
    return out


def gather_epoch(staged, idx_batches):
    """All-epoch batch pre-gather: [nb, S] subject indices -> the same batch
    dict ``gather_batch`` builds, with a leading nb axis — ONE device gather
    per epoch leaf instead of one per scan trip (a lax.scan over the result
    slices each trip's batch out with a dynamic-slice, which is cheaper on
    TPU than per-trip gathers of the same rows)."""
    nb, S = idx_batches.shape
    T = staged["valid"].shape[1]
    flat = gather_batch(staged, idx_batches.reshape(-1))
    out = {k: v.reshape(nb, S * T, -1) for k, v in flat.items()
           if k != "valid"}
    out["valid"] = flat["valid"].reshape(nb, S, T)
    return out


def epoch_subject_batches(P: int, subjects_per_batch: int,
                          rng: Optional[np.random.Generator] = None):
    """Subject-index batches for one epoch (host side, tiny arrays)."""
    order = np.arange(P)
    if rng is not None:
        rng.shuffle(order)
    for i in range(0, P, subjects_per_batch):
        chunk = order[i:i + subjects_per_batch]
        if len(chunk) < subjects_per_batch:
            chunk = np.concatenate(
                [chunk, -np.ones(subjects_per_batch - len(chunk), np.int64)])
        yield chunk


# ---------------------------------------------------------------------------
# mesh-sharded staging: the staged dataset gains an explicit leading device
# axis [D, P_local, T, ...] that shards over the mesh's 'data' axis, and the
# per-epoch batch indices become LOCAL per-shard permutations [nb, D, S_loc].
# The scan-body gather is then a vmap over the device axis — every shard
# gathers only from its own subject block, so the SPMD partitioner emits NO
# collectives for the gather (the step's psums over 'data' for the KLD
# accumulators and normalization moments are unchanged).  This is what lets
# the one-dispatch-per-EPOCH training program run on a (data x latent) mesh.
# ---------------------------------------------------------------------------

def stage_dataset_mesh(ds: LongitudinalDataset, dtype, n_data: int):
    """Upload the dataset as [n_data, P_local, T_max, ...] device arrays;
    subjects are dealt to shards in contiguous blocks, short shards padded
    with empty subjects (valid == 0)."""
    import jax.numpy as jnp

    P_loc = -(-ds.P // n_data)
    idx = np.concatenate([np.arange(ds.P),
                          -np.ones(n_data * P_loc - ds.P, np.int64)])
    full = _pad_rows(ds, idx, ds.T_max)
    D, T = n_data, ds.T_max

    def shape4(a):
        return a.reshape(D, P_loc, T, -1)

    return {
        "data": jnp.asarray(shape4(full["data"]), dtype),
        "mask": jnp.asarray(shape4(full["mask"]), dtype),
        "theta_mask": jnp.asarray(shape4(full["theta_mask"]), dtype),
        "labels": jnp.asarray(shape4(full["labels"]), dtype),
        "valid": jnp.asarray(full["valid"].reshape(D, P_loc, T), dtype),
    }


def gather_batch_mesh(staged, subj_idx):
    """Per-shard on-device batch gather: staged [D, P_local, T, ...] and
    LOCAL indices subj_idx [D, S_loc] (-1 = padding) -> flat-row batch dict
    with S = D*S_loc subjects, rows sharded over 'data'."""
    import jax
    import jax.numpy as jnp

    idx = jnp.asarray(subj_idx)
    safe = jnp.maximum(idx, 0)
    alive = (idx >= 0).astype(staged["valid"].dtype)   # [D, S_loc]
    D, S_loc = idx.shape
    T = staged["valid"].shape[2]
    take = jax.vmap(lambda blk, i: blk[i])
    out = {}
    for k in ("data", "mask", "theta_mask", "labels"):
        v = take(staged[k], safe) * alive[:, :, None, None]
        out[k] = v.reshape(D * S_loc * T, -1)
    out["valid"] = (take(staged["valid"], safe)
                    * alive[:, :, None]).reshape(D * S_loc, T)
    return out


def epoch_subject_batches_mesh(P: int, n_data: int, subjects_per_batch: int,
                               rng: Optional[np.random.Generator] = None
                               ) -> np.ndarray:
    """One epoch of LOCAL per-shard subject indices, shape [nb, D, S_loc].

    Each shard owns P_local = ceil(P/D) subject slots (the stage_dataset_mesh
    block layout) and shuffles its REAL subjects independently; every real
    subject appears exactly once per epoch.  S_loc = ceil(S/D), so the global
    batch is the same ``subjects_per_batch`` whenever D divides it (it is
    rounded up to D*S_loc otherwise).  With n_data == 1 this reduces to
    ``epoch_subject_batches`` semantics exactly (one shard, same chunking)."""
    P_loc = -(-P // n_data)
    S_loc = -(-subjects_per_batch // n_data)
    nb = -(-P_loc // S_loc)
    out = -np.ones((nb, n_data, S_loc), np.int64)
    for d in range(n_data):
        n_real = min(P_loc, max(0, P - d * P_loc))
        order = np.arange(n_real)
        if rng is not None:
            rng.shuffle(order)
        for b in range(nb):
            chunk = order[b * S_loc:(b + 1) * S_loc]
            out[b, d, :len(chunk)] = chunk
    return out
