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

        items = [dataset[i] for i in range(len(dataset))]
        first = items[0]
        arrays: Dict[str, np.ndarray] = {}
        self._orig_dtype: Dict[str, Any] = {}
        for k, v in first.items():
            if k == "meta" or k in BatchLoader.LIST_KEYS:
                continue
            if (isinstance(v, np.ndarray) or np.isscalar(v)) \
                    and np.issubdtype(np.asarray(v).dtype, np.number):
                a = np.stack([np.asarray(it[k]) for it in items])
                if cache_dtype is not None and np.issubdtype(a.dtype, np.floating):
                    # compressed cache: halve HBM footprint, cast back after
                    # the per-batch gather
                    self._orig_dtype[k] = a.dtype
                    a = a.astype(jnp.dtype(cache_dtype))
                arrays[k] = a
        # precomputed host targets (BatchLoader.LIST_KEYS) are NOT cached —
        # device-cached training always uses the on-device assigner, which
        # needs raw poses; fail loudly if the dataset provides only
        # precomputed targets
        if "poses" not in arrays or "num_poses" not in arrays:
            raise ValueError(
                "DeviceCachedLoader requires 'poses'/'num_poses' in dataset "
                "items (on-device target assignment); precomputed host "
                "targets (hm/ind/mask/...) are not cached — use BatchLoader")
        # store every array flattened to (N, K): TPU tiles the trailing two
        # dims to (8, 128), so e.g. a (..., 160, 32)-shaped cache would pad
        # channels 32 -> 128 and QUADRUPLE its HBM footprint; one huge K
        # pads to the next multiple of 128 only
        self._shapes = {k: a.shape[1:] for k, a in arrays.items()}
        arrays = {k: a.reshape(a.shape[0], -1) if a.ndim > 1 else a
                  for k, a in arrays.items()}
        # sharded cache (P('data') on the sample axis): each device holds
        # 1/N of the dataset, so cacheable size scales with the mesh instead
        # of being capped by one chip's HBM; per-batch gathers become GSPMD
        # collectives over ICI.  device_put needs the leading dim divisible
        # by the shard count — pad with repeats of the last row (never
        # indexed: batch indices stay < n)
        self.sharding = sharding
        if sharding is not None and not sharding.is_fully_replicated:
            ways = sharding.num_devices
            pad = (-len(items)) % ways
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
        self.n = len(items)
        self.metas = [it.get("meta") for it in items]
        self.data = {k: jax.device_put(v, sharding) for k, v in arrays.items()}

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        return shard_indices(self.n, self.seed + self.epoch, self.shuffle,
                             self.num_shards, self.shard_id, self.drop_last)

    def __len__(self):
        per_shard = len(self._indices())
        if self.drop_last:
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
            batch: Dict[str, Any] = {}
            for k, v in self.data.items():
                g = jnp.take(v, sel_dev, axis=0)
                if k in self._orig_dtype:
                    g = g.astype(self._orig_dtype[k])
                batch[k] = g.reshape(bs, *self._shapes[k])
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

    Shuffle semantics are BLOCK shuffle (chunk order x within-chunk order
    per epoch), not the global permutation of BatchLoader/DeviceCachedLoader
    — every sample is still visited exactly once per epoch.  With a single
    chunk this degenerates to DeviceCachedLoader's behavior (tested).

    Batch sizes must divide into each chunk: chunk lengths are made a
    multiple of ``batch_size`` (the construction permutation's remainder
    chunk is padded by repeats, ``valid`` marks the real count).
    """

    def __init__(self, dataset, batch_size: int, chunk_bytes: int,
                 shuffle: bool = True, seed: int = 0, cache_dtype=None,
                 num_shards: int = 1, shard_id: int = 0):
        import jax.numpy as jnp

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.cache_dtype = cache_dtype
        self.num_shards = num_shards
        self.shard_id = shard_id

        # probe one item for shapes/dtypes -> samples per chunk
        first = dataset[0]
        self._keys = []
        self._shapes = {}
        self._dtypes = {}
        self._orig_dtype = {}
        per_sample = 0
        for k, v in first.items():
            if k == "meta" or k in BatchLoader.LIST_KEYS:
                continue
            a = np.asarray(v)
            if not np.issubdtype(a.dtype, np.number):
                continue
            dt = a.dtype
            if cache_dtype is not None and np.issubdtype(dt, np.floating):
                self._orig_dtype[k] = dt
                dt = np.dtype(jnp.dtype(cache_dtype))
            self._keys.append(k)
            self._shapes[k] = a.shape
            self._dtypes[k] = dt
            per_sample += int(np.prod(a.shape)) * dt.itemsize
        if "poses" not in self._keys or "num_poses" not in self._keys:
            raise ValueError("StreamingDeviceLoader requires 'poses'/"
                             "'num_poses' (on-device target assignment)")

        # per-host shard of the sample space, then fixed chunk assignment
        n_total = len(dataset)
        mine = np.arange(n_total)[shard_id::num_shards]
        rng = np.random.default_rng(seed)
        mine = rng.permutation(mine)                  # mixing across chunks
        per_chunk = max(batch_size,
                        (chunk_bytes // max(per_sample, 1)) // batch_size
                        * batch_size)
        pad = (-len(mine)) % batch_size
        self._pad = pad
        if pad:
            mine = np.concatenate([mine, np.repeat(mine[-1:], pad)])
        self.chunks = [mine[i:i + per_chunk]
                       for i in range(0, len(mine), per_chunk)]
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
        import jax.numpy as jnp
        from concurrent.futures import ThreadPoolExecutor

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
                is_last_chunk = chunk_id == len(self.chunks) - 1
                for b in range(m // bs):
                    sel = within[b * bs:(b + 1) * bs]
                    sel_dev = jax.device_put(sel.astype(np.int32))
                    batch = {}
                    for k, v in data.items():
                        g = jnp.take(v, sel_dev, axis=0)
                        if k in self._orig_dtype:
                            g = g.astype(self._orig_dtype[k])
                        batch[k] = g.reshape(bs, *self._shapes[k])
                    batch["meta"] = [metas[int(i)] for i in sel]
                    # padded repeats live at the tail of the LAST chunk;
                    # under shuffle they scatter within it, so 'valid' is
                    # conservative only for the unshuffled eval case
                    batch["valid"] = np.int32(bs)
                    yield batch
