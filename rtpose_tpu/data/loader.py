"""Batch loader: per-host sharding, epoch-seeded shuffling, threaded prefetch.

Replaces the reference's DataLoader + DistributedGroupSampler stack
(``det3d/datasets/loader/``): on TPU there is one Python process per host and
the loader shards the index space by ``jax.process_index()`` exactly like
``DistributedGroupSampler`` shards by rank (epoch-seeded randperm, per-rank
slice — sampler.py:139-223).  A background thread assembles the next batch
while the device computes, mirroring ``prefetch_factor`` semantics without
worker processes (the numpy work per batch is a load+crop+normalize).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np


def group_shard_indices(flags, batch_size: int, epoch: int, shuffle: bool,
                        num_shards: int, shard_id: int) -> np.ndarray:
    """Aspect-flag group batching (GroupSampler / DistributedGroupSampler
    parity, reference ``datasets/loader/sampler.py:98-223``): within each
    flag group, epoch-seeded shuffle and pad (by wrap-around) to a multiple
    of ``batch_size * num_shards``; concatenate the groups, shuffle whole
    batches, then take the per-shard contiguous slice.  Every yielded batch
    is flag-homogeneous and all shards see the same number of batches.
    """
    flags = np.asarray(flags)
    rng = np.random.default_rng(epoch)
    groups = np.unique(flags)
    per = batch_size * num_shards
    chunks = []
    for f in groups:
        idx = np.flatnonzero(flags == f)
        if shuffle:
            idx = rng.permutation(idx)
        extra = (-len(idx)) % per
        if extra:
            # np.resize wraps the group as many times as needed — a group
            # smaller than ``extra`` (tiny dataset, small flag group) must
            # still pad to a full multiple of ``per``
            idx = np.resize(idx, len(idx) + extra)
        chunks.append(idx)
    batches = np.concatenate(chunks).reshape(-1, batch_size)
    if shuffle and len(groups) > 1:
        # cross-group batch shuffle: only needed to interleave groups.  With
        # ONE group (PointCloudDataset's default uniform flag) the in-group
        # permutation already equals shard_indices' plain permutation, and
        # skipping this second shuffle keeps the epoch order BIT-IDENTICAL
        # to the validated flagless trajectories (training-basin selection
        # is measurably order-sensitive — BASELINE.md's GN knife edge;
        # round-5 regression: wiring CRUWPoseDataset to the base class gave
        # every dataset a uniform flag, and the extra reshuffle silently
        # shifted validated runs into the predict-the-mean basin)
        batches = batches[rng.permutation(len(batches))]
    indices = batches.reshape(-1)
    num_samples = len(indices) // num_shards
    return indices[shard_id * num_samples: (shard_id + 1) * num_samples]


def shard_indices(n: int, epoch: int, shuffle: bool, num_shards: int,
                  shard_id: int, drop_last: bool) -> np.ndarray:
    """Epoch-seeded global permutation, padded to a multiple of num_shards,
    sliced per shard (DistributedGroupSampler parity)."""
    if shuffle:
        rng = np.random.default_rng(epoch)
        order = rng.permutation(n)
    else:
        order = np.arange(n)
    if drop_last:
        usable = (n // num_shards) * num_shards
        order = order[:usable]
    else:
        pad = (-len(order)) % num_shards
        if pad:
            order = np.concatenate([order, order[:pad]])
    return order[shard_id::num_shards]


class BatchLoader:
    """Iterates dict-of-numpy batches over a map-style dataset.

    Batch layout: every array key in the sample is stacked on a new leading
    axis; per-task list keys (hm/ind/mask/cat/anno_pose) are stacked
    element-wise; 'meta' becomes a list.  The final short batch of an eval
    epoch is padded by repeating the last sample, with 'valid' carrying the
    real count (fixed shapes keep one compiled executable).
    """

    LIST_KEYS = ("hm", "ind", "mask", "cat", "anno_pose")
    # fused-epoch training (Trainer.train_epoch_fused) needs the whole
    # dataset resident in HBM; host-path loaders fall back to the
    # per-step loop
    supports_fused_epochs = False

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: Optional[bool] = None, num_shards: int = 1,
                 shard_id: int = 0, prefetch: int = 2, seed: int = 0,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        # ``workers_per_gpu`` parity (reference build_dataloader,
        # loader/build_loader.py): N parallel sample loads per batch.
        # Threads, not processes — the per-sample work is numpy/native
        # decode+crop which releases the GIL, threads are fork-safe next to
        # a live JAX runtime, and arrays need no IPC copy.
        self.num_workers = num_workers
        self._pool = None
        if num_workers and num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)

    def set_epoch(self, epoch: int):
        """DistSamplerSeedHook parity (hooks/sampler_seed.py:4-6)."""
        self.epoch = epoch

    def __len__(self):
        per_shard = len(self._indices())
        if self.drop_last:
            return per_shard // self.batch_size
        return (per_shard + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        flags = getattr(self.dataset, "flag", None)
        if flags is not None and self.shuffle:
            # datasets exposing an aspect-group `flag` array get
            # flag-homogeneous batches when shuffling (GroupSampler is a
            # TRAIN-time sampler in the reference — build_loader.py:23-59
            # uses it only for shuffle=True; eval loaders stay sequential
            # with tail padding, never wrap-around-padded)
            return group_shard_indices(flags, self.batch_size,
                                       self.seed + self.epoch, self.shuffle,
                                       self.num_shards, self.shard_id)
        return shard_indices(len(self.dataset), self.seed + self.epoch,
                             self.shuffle, self.num_shards, self.shard_id,
                             self.drop_last)

    def _collate(self, items: List[dict], valid: int) -> Dict[str, Any]:
        batch: Dict[str, Any] = {}
        first = items[0]
        for k, v in first.items():
            if k == "meta":
                batch["meta"] = [it["meta"] for it in items]
            elif k in self.LIST_KEYS:
                batch[k] = [np.stack([it[k][t] for it in items])
                            for t in range(len(v))]
            elif (isinstance(v, np.ndarray) or np.isscalar(v)) \
                    and np.issubdtype(np.asarray(v).dtype, np.number):
                batch[k] = np.stack([np.asarray(it[k]) for it in items])
            # non-numeric keys (e.g. 'mode') are dropped from device batches
        batch["valid"] = np.int32(valid)
        return batch

    def _batches(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            sel = idx[b * bs : (b + 1) * bs]
            valid = len(sel)
            if valid < bs:  # pad final eval batch to fixed shape
                sel = np.concatenate([sel, np.repeat(sel[-1:], bs - valid)])
            if self._pool is not None:
                items = list(self._pool.map(self.dataset.__getitem__,
                                            [int(i) for i in sel]))
            else:
                items = [self.dataset[int(i)] for i in sel]
            yield self._collate(items, valid)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: List[BaseException] = []

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            except BaseException as e:  # surface loader errors in the main thread
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item


_COMPRESS_MIN_BYTES = 1024


def _numeric_spec(first: dict, cache_dtype):
    """Numeric-array spec of one sample: (keys, shapes, cache dtypes,
    original dtypes of compressed keys).  Shared by the device-resident
    loaders so their caching rules stay in lockstep.

    ``cache_dtype`` compresses only float keys that are (a) LARGE (>= 1 KB
    per sample — the radar cubes; compressing a 180-byte pose array saves
    nothing) and (b) actually shrunk by the cast (f32 -> bf16 yes, f16 ->
    bf16 no).  In particular the pose LABELS always stay in their original
    dtype: a bf16 cache quantum at 5-8 m world coordinates is 3-6 cm —
    silent label noise on the order of the model's own MPJPE."""
    import jax.numpy as jnp
    keys, shapes, dtypes, orig = [], {}, {}, {}
    cd = (np.dtype(jnp.dtype(cache_dtype)) if cache_dtype is not None
          else None)
    for k, v in first.items():
        if k == "meta" or k in BatchLoader.LIST_KEYS:
            continue
        a = np.asarray(v)
        if not np.issubdtype(a.dtype, np.number):
            continue
        dt = a.dtype
        if (cd is not None and np.issubdtype(dt, np.floating)
                and cd.itemsize < dt.itemsize
                and a.nbytes >= _COMPRESS_MIN_BYTES):
            orig[k] = dt
            dt = cd
        keys.append(k)
        shapes[k] = a.shape
        dtypes[k] = dt
    if "poses" not in keys or "num_poses" not in keys:
        raise ValueError(
            "device-resident loaders require 'poses'/'num_poses' in dataset "
            "items (on-device target assignment); precomputed host targets "
            "(hm/ind/mask/...) are not cached — use BatchLoader")
    return keys, shapes, dtypes, orig


def _gather_batch(data, sel_dev, bs, shapes, orig_dtype):
    """On-device batch gather from (N, K)-stored cache arrays."""
    import jax.numpy as jnp
    batch = {}
    for k, v in data.items():
        g = jnp.take(v, sel_dev, axis=0)
        if k in orig_dtype:
            g = g.astype(orig_dtype[k])
        batch[k] = g.reshape(bs, *shapes[k])
    return batch


class DeviceCachedLoader:
    """Device-resident dataset: every sample's arrays are uploaded to HBM
    ONCE; per-step batches are built with an on-device gather, so the hot
    loop has zero host->device traffic.

    The TPU-native answer to per-step H2D being the bottleneck (slow
    interconnects, or hosts with few cores): a full 100-epoch run re-reads
    each frame 100x through the host path, while the device could fetch it
    from HBM.  Gate by size — the cache must fit alongside params and
    activations (a 96-frame synthetic set is ~2 GB; a 72k-frame CRUW epoch
    is not cacheable).

    Interface-compatible with BatchLoader for the training path
    (``set_epoch`` / ``len`` / iteration, same epoch-seeded shuffle
    semantics via ``shard_indices``); batches carry jax arrays plus the
    'meta' list and 'valid' count.
    """

    # the whole dataset lives in HBM (``data``/``_shapes``/``_orig_dtype``
    # feed make_epoch_step) — the one loader the fused-epoch scan can run on
    supports_fused_epochs = True

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: Optional[bool] = None, num_shards: int = 1,
                 shard_id: int = 0, seed: int = 0, sharding=None,
                 max_bytes: Optional[int] = None, cache_dtype=None):
        import jax
        import jax.numpy as jnp

        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.seed = seed
        self.epoch = 0
        # aspect-group flags captured at build time (the cache drops the
        # dataset reference once rows are uploaded)
        flags = getattr(dataset, "flag", None)
        self._flags = None if flags is None else np.asarray(flags)

        # precomputed host targets (BatchLoader.LIST_KEYS) are NOT cached —
        # device-cached training always uses the on-device assigner (needs
        # raw poses); compressed (cache_dtype) float keys are cast back
        # after the per-batch gather.  Arrays are stored flattened to
        # (N, K): TPU tiles the trailing two dims to (8, 128), so e.g. a
        # (..., 160, 32)-shaped cache would pad channels 32 -> 128 and
        # QUADRUPLE its HBM footprint; one huge K pads to the next multiple
        # of 128 only.  Rows are filled one sample at a time directly into
        # preallocated cache-dtype arrays — host peak is the CACHE size, not
        # the full-f32 dataset (a 1920-frame f8 cache builds in 10 GB of
        # host RAM instead of ~90).
        n_items = len(dataset)
        first = dataset[0]
        keys, shapes, dtypes, self._orig_dtype = _numeric_spec(first,
                                                               cache_dtype)
        self._shapes = shapes
        arrays = {k: np.empty((n_items, max(1, int(np.prod(shapes[k])))),
                              dtypes[k]) for k in keys}
        self.metas = []
        for i in range(n_items):
            it = first if i == 0 else dataset[i]
            for k in keys:
                arrays[k][i] = (np.asarray(it[k])
                                .astype(dtypes[k], copy=False).reshape(-1))
            self.metas.append(it.get("meta"))
        first = None
        # sharded cache (P('data') on the sample axis): each device holds
        # 1/N of the dataset, so cacheable size scales with the mesh instead
        # of being capped by one chip's HBM; per-batch gathers become GSPMD
        # collectives over ICI.  device_put needs the leading dim divisible
        # by the shard count — pad with repeats of the last row (never
        # indexed: batch indices stay < n)
        self.sharding = sharding
        if sharding is not None and not sharding.is_fully_replicated:
            ways = sharding.num_devices
            pad = (-n_items) % ways
            if pad:
                arrays = {k: np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                          for k, a in arrays.items()}
        total = sum(a.nbytes for a in arrays.values())
        if max_bytes is not None and total > max_bytes:
            raise ValueError(
                f"DeviceCachedLoader: dataset needs {total / 1e9:.2f} GB on "
                f"device, over the {max_bytes / 1e9:.2f} GB cap — use "
                "BatchLoader for datasets that do not fit in HBM")
        self.nbytes = total
        self.n = n_items
        self.data = {k: jax.device_put(v, sharding) for k, v in arrays.items()}

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        if self._flags is not None and self.shuffle:
            # same GroupSampler-parity index stream as BatchLoader so the
            # two training loaders see identical epochs (flag-homogeneous
            # batches, wrap-around padded to full batches)
            return group_shard_indices(self._flags, self.batch_size,
                                       self.seed + self.epoch, self.shuffle,
                                       self.num_shards, self.shard_id)
        return shard_indices(self.n, self.seed + self.epoch, self.shuffle,
                             self.num_shards, self.shard_id, self.drop_last)

    def __len__(self):
        per_shard = len(self._indices())
        if self.drop_last and not (self._flags is not None and self.shuffle):
            return per_shard // self.batch_size
        return (per_shard + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import jax
        import jax.numpy as jnp
        from jax import lax

        idx = self._indices()
        bs = self.batch_size
        n_batches = len(self)
        # pad the permutation on the host, upload it ONCE per epoch: the
        # per-batch work below is then pure on-device dispatch (a blocking
        # tiny H2D per batch costs a full interconnect RTT)
        pad = n_batches * bs - len(idx)
        if pad > 0:      # final short eval batch: repeat the last sample
            idx_padded = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        else:            # drop_last: trailing remainder is not used
            idx_padded = idx[: n_batches * bs]
        idx_dev = jax.device_put(idx_padded.astype(np.int32))
        for b in range(n_batches):
            sel = idx_padded[b * bs : (b + 1) * bs]
            valid = min(bs, len(idx) - b * bs)
            sel_dev = lax.dynamic_slice(idx_dev, (b * bs,), (bs,))
            batch: Dict[str, Any] = _gather_batch(self.data, sel_dev, bs,
                                                  self._shapes,
                                                  self._orig_dtype)
            batch["meta"] = [self.metas[int(i)] for i in sel]
            batch["valid"] = np.int32(valid)
            yield batch


class StreamingDeviceLoader:
    """Device-resident batches for datasets LARGER than one chip's HBM.

    The sample space is split (by a construction-seeded permutation) into
    chunks whose arrays fit a ``chunk_bytes`` budget.  Each epoch visits the
    chunks in an epoch-seeded random order; while the device trains on the
    resident chunk (same on-device gather batching as
    ``DeviceCachedLoader``), a background thread decodes and uploads the
    NEXT chunk — double buffering, so HBM holds at most two chunks and the
    host path overlaps device compute (prefetch-to-device; the TPU-native
    version of the reference's worker prefetch, build_loader.py).

    Shuffle semantics are BLOCK shuffle (a construction-seeded permutation
    assigns samples to chunks; each epoch reshuffles chunk order and
    within-chunk order), not the global permutation of
    BatchLoader/DeviceCachedLoader — every sample is still visited exactly
    once per epoch.  With ``shuffle=False`` samples stay in dataset order,
    so a single chunk degenerates to DeviceCachedLoader's unshuffled
    behavior exactly (tested).

    Multi-host: the GLOBAL index list is padded to a shard multiple before
    slicing (like ``shard_indices``) so every host runs the same number of
    steps per epoch — unequal shards would deadlock the SPMD collectives.
    Chunk lengths are a multiple of ``batch_size`` (the remainder is padded
    by repeats; ``valid`` carries the real count, contiguous-prefix only in
    the unshuffled case).
    """

    supports_fused_epochs = False  # only one chunk is resident at a time

    def __init__(self, dataset, batch_size: int, chunk_bytes: int,
                 shuffle: bool = True, seed: int = 0, cache_dtype=None,
                 num_shards: int = 1, shard_id: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.cache_dtype = cache_dtype
        self.num_shards = num_shards
        self.shard_id = shard_id

        self._keys, self._shapes, self._dtypes, self._orig_dtype = \
            _numeric_spec(dataset[0], cache_dtype)
        per_sample = sum(int(np.prod(self._shapes[k])) * self._dtypes[k].itemsize
                         for k in self._keys)

        # equal per-host shards (pad the GLOBAL list to a shard multiple,
        # shard_indices-style), then fixed chunk assignment
        n_total = len(dataset)
        order = (np.random.default_rng(seed).permutation(n_total)
                 if shuffle else np.arange(n_total))  # cross-chunk mixing
        pad_sh = (-n_total) % num_shards
        if pad_sh:
            order = np.concatenate([order, order[:pad_sh]])
        mine = order[shard_id::num_shards]
        per_chunk = max(batch_size,
                        (chunk_bytes // max(per_sample, 1)) // batch_size
                        * batch_size)
        self._n_real = len(mine)
        pad = (-len(mine)) % batch_size
        if pad:            # repeats; positions >= _n_real are padding
            mine = np.concatenate([mine, np.repeat(mine[-1:], pad)])
        self.chunks = [mine[i:i + per_chunk]
                       for i in range(0, len(mine), per_chunk)]
        self._chunk_start = list(range(0, len(mine), per_chunk))
        self.n = len(mine)                            # padded count
        self.samples_per_chunk = per_chunk

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.n // self.batch_size

    def _load_chunk(self, idx: np.ndarray):
        """Decode + stack + upload one chunk (runs on the prefetch thread)."""
        import jax
        items = [self.dataset[int(i)] for i in idx]
        dev = {}
        for k in self._keys:
            a = np.stack([np.asarray(it[k]) for it in items])
            a = a.astype(self._dtypes[k]).reshape(len(items), -1)
            dev[k] = jax.device_put(a)
        metas = [it.get("meta") for it in items]
        return dev, metas

    def __iter__(self):
        import jax
        from concurrent.futures import ThreadPoolExecutor
        from jax import lax

        rng = np.random.default_rng(self.seed + self.epoch + 1)
        order = (rng.permutation(len(self.chunks)) if self.shuffle
                 else np.arange(len(self.chunks)))
        bs = self.batch_size

        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(self._load_chunk, self.chunks[order[0]])
            for ci, chunk_id in enumerate(order):
                data, metas = nxt.result()
                if ci + 1 < len(order):   # overlap the next upload
                    nxt = pool.submit(self._load_chunk,
                                      self.chunks[order[ci + 1]])
                m = len(self.chunks[chunk_id])
                within = (rng.permutation(m) if self.shuffle
                          else np.arange(m))
                # ONE index upload per chunk; per-batch slices stay on
                # device (a blocking tiny H2D per batch costs a full
                # interconnect RTT — see DeviceCachedLoader.__iter__)
                within_dev = jax.device_put(within.astype(np.int32))
                start = self._chunk_start[chunk_id]
                real = (start + within) < self._n_real
                for b in range(m // bs):
                    sel = within[b * bs:(b + 1) * bs]
                    sel_dev = lax.dynamic_slice(within_dev, (b * bs,), (bs,))
                    batch = _gather_batch(data, sel_dev, bs, self._shapes,
                                          self._orig_dtype)
                    batch["meta"] = [metas[int(i)] for i in sel]
                    # real-sample count; a contiguous prefix only when
                    # unshuffled (pads sit at the tail) — the eval contract
                    batch["valid"] = np.int32(real[b * bs:(b + 1) * bs].sum())
                    yield batch
