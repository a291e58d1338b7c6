"""Input pipeline: host decode/crop -> device-side augmentation
(reference datasets/loader.py).

Replaces the reference's CUDA-stream PrefetchLoader + fast_collate
(loader.py:19-125) with the TPU-idiomatic split:
- host threads decode + geometric transform to uint8 NHWC and collate
  (double-buffered prefetch queue);
- one jitted device function does RandAugment -> normalize -> RandomErasing
  on the accelerator (the reference does normalize/erasing on a side CUDA
  stream; on TPU it fuses into a handful of kernels and overlaps with the
  train step via async dispatch);
- per-host batch sharding replaces DistributedSampler (train) and
  OrderedDistributedSampler (eval) — eval pads the final batch and carries a
  ``valid`` mask instead of the reference's silent rank-striding.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cotnet_tpu.data.rand_augment import RandAugment, rand_augment_transform
from cotnet_tpu.data.random_erasing import RandomErasing
from cotnet_tpu.data.transforms import create_eval_transform, create_train_transform

# ---------------------------------------------------------------------------
# Worker-process machinery (the reference rides torch DataLoader's worker
# processes, loader.py:147-186; CPython threads can't scale PIL decode — the
# GIL caps an 8-thread pool at ~1.1x single-thread throughput, measured).
# Functions must be module-level for multiprocessing spawn pickling.

_WORKER_DS = None


def _proc_worker_init(ds_bytes: bytes, base_seed: int, wid_counter=None):
    """Runs once in each worker process.  The parent scrubbed accelerator
    env vars around the spawn, so any transitive jax import here is
    CPU-only and never touches the TPU tunnel."""
    global _WORKER_DS
    import random as _random

    _WORKER_DS = pickle.loads(ds_bytes)
    # deterministic worker index (a shared counter, NOT the pid — pids vary
    # across runs, so pid-derived seeds are irreproducible by construction)
    if wid_counter is not None:
        with wid_counter.get_lock():
            wid = wid_counter.value
            wid_counter.value += 1
    else:
        wid = 0
    _random.seed(base_seed * 100003 + wid)
    np.random.seed((base_seed * 100003 + wid) % (2 ** 31))
    # per-worker reseed for transforms carrying an explicit RandomState
    # (e.g. TfTrainPreprocess): the pickled copy is identical across workers
    t = getattr(_WORKER_DS, "transform", None)
    if getattr(t, "rng", None) is not None:
        t.rng = np.random.RandomState((base_seed + wid) % (2 ** 31))


def _sample_seed(chunk_seed: int, k: int) -> int:
    """Per-sample seed from a chunk seed + position (collision-free for
    batch sizes << 1000003)."""
    return (chunk_seed * 1000003 + k) % (2 ** 31)


def _proc_fetch(args):
    """Decode + transform a chunk of dataset indices in a worker process.

    Every random draw — geometric transform (global `random`) and policy
    augment (host_augment's per-sample rng) — is reseeded per SAMPLE from
    the chunk seed, so a run reproduces given the same loader seed/epoch
    regardless of how chunks land on workers."""
    idxs, seed = args
    import random as _random

    from cotnet_tpu.data.host_augment import seed_sample_rng

    transform = getattr(_WORKER_DS, "transform", None)
    has_rng = getattr(transform, "rng", None) is not None
    imgs, targets = [], []
    for k, i in enumerate(idxs):
        s = _sample_seed(seed, k)
        _random.seed(s)
        seed_sample_rng(s)
        if has_rng:  # e.g. TfTrainPreprocess — pool scheduling must not
            transform.rng = np.random.RandomState(s)  # matter either
        im, t = _WORKER_DS[i]
        imgs.append(im)
        targets.append(t)
    return np.stack(imgs), np.asarray(targets, np.int32)


def _proc_warmup(secs):
    import time

    time.sleep(secs)
    return os.getpid()


def _spawn_worker_pool(dataset, workers: int, seed: int):
    """ProcessPoolExecutor with TPU-safe spawn: children inherit os.environ
    at spawn time, so accelerator selection is forced to CPU for the spawn
    window and restored afterwards."""
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor

    saved = {}
    overrides = {"JAX_PLATFORMS": "cpu"}
    for k in list(os.environ):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            saved[k] = os.environ.pop(k)
    for k, v in overrides.items():
        saved.setdefault(k, os.environ.get(k))
        os.environ[k] = v
    try:
        ctx = multiprocessing.get_context("spawn")
        pool = ProcessPoolExecutor(
            workers, mp_context=ctx,
            initializer=_proc_worker_init,
            initargs=(pickle.dumps(dataset), seed, ctx.Value("i", 0)))
        # force every worker to spawn inside the scrubbed-env window
        # (executors spawn lazily; the concurrent sleeps need all of them)
        list(pool.map(_proc_warmup, [0.2] * workers))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return pool

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


def make_device_augment(mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
                        rand_augment: Optional[RandAugment] = None,
                        random_erasing: Optional[RandomErasing] = None,
                        dtype=jnp.float32, num_aug_splits: int = 0):
    """Build the jitted uint8-batch -> normalized-batch device function.

    ``num_aug_splits`` > 1 produces [clean; aug_1; ...; aug_{S-1}] stacked on
    the batch dim (the AugMixDataset arrangement, dataset.py:181-218) for JSD
    consistency training — the clean split skips the policy augmentation."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0

    @jax.jit
    def device_augment(rng, batch_u8):
        x = batch_u8.astype(jnp.float32)
        if num_aug_splits > 1 and rand_augment is not None:
            splits = [x]
            for i in range(num_aug_splits - 1):
                rng, k = jax.random.split(rng)
                splits.append(rand_augment(k, x))
            x = jnp.concatenate(splits, axis=0)
        elif rand_augment is not None:
            rng, k = jax.random.split(rng)
            x = rand_augment(k, x)
        x = (x - mean) / std
        if random_erasing is not None:
            x = random_erasing(rng, x)
        return x.astype(dtype)

    return device_augment


class _Prefetcher:
    """Prefetch pipeline: index batches -> collated uint8 numpy arrays.

    Decode+transform runs either on a worker-process pool (``proc_pool``,
    scales with cores — the default for real training via
    ``Loader(worker_procs=True)``) or an in-process thread pool (cheap to
    set up; GIL-bound, fine for tests/small runs)."""

    def __init__(self, dataset, indices, batch_size, workers=8, depth=4,
                 drop_last=True, pad_last=False, proc_pool=None, seed=0):
        self.dataset = dataset
        self.indices = indices
        self.batch_size = batch_size
        self.workers = max(1, workers)
        self.depth = depth
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.proc_pool = proc_pool
        self.seed = seed

    def _batches(self):
        n = len(self.indices)
        for i in range(0, n, self.batch_size):
            chunk = self.indices[i:i + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_last:
                    pad = [chunk[-1]] * (self.batch_size - len(chunk))
                    yield list(chunk) + pad, len(chunk)
                    return
            yield list(chunk), len(chunk)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()

        def fetch_procs(pool, chunk, bidx):
            sub = max(1, -(-len(chunk) // self.workers))
            parts = [(chunk[j:j + sub], self.seed * 1000003 + bidx * 997 + j)
                     for j in range(0, len(chunk), sub)]
            results = list(pool.map(_proc_fetch, parts))
            imgs = np.concatenate([r[0] for r in results])
            labels = np.concatenate([r[1] for r in results])
            return imgs, labels

        def worker():
            try:
                from concurrent.futures import ThreadPoolExecutor

                from cotnet_tpu.data import native

                use_native = native.available()

                def fetch_one(args):
                    # per-sample policy-augment seeding (thread-local): the
                    # default aug_backend="host" draws must derive from the
                    # loader seed like the device path's PRNGKey did.  The
                    # geometric transforms still ride the thread-shared
                    # global `random` here; the worker-procs path seeds
                    # those per sample too (_proc_fetch).
                    bseed, k, i = args
                    from cotnet_tpu.data.host_augment import seed_sample_rng
                    seed_sample_rng(_sample_seed(bseed, k))
                    return self.dataset[i]

                with ThreadPoolExecutor(self.workers) as pool:
                    for bidx, (chunk, valid) in enumerate(self._batches()):
                        if self.proc_pool is not None:
                            imgs, labels = fetch_procs(self.proc_pool, chunk,
                                                       bidx)
                        else:
                            bseed = self.seed * 1000003 + bidx * 997
                            samples = list(pool.map(
                                fetch_one,
                                [(bseed, k, i)
                                 for k, i in enumerate(chunk)]))
                            arrs = [s[0] for s in samples]
                            if (use_native and arrs[0].ndim == 3
                                    and arrs[0].dtype == np.uint8
                                    and all(a.shape == arrs[0].shape
                                            for a in arrs)):
                                # multithreaded C++ collate — np.stack
                                # memcpys single-threaded, ~19 MB per
                                # bs128@224 batch on the host critical path
                                imgs = native.batch_collate(arrs,
                                                            self.workers)
                            else:
                                imgs = np.stack(arrs)
                            labels = np.asarray([s[1] for s in samples],
                                                np.int32)
                        mask = np.zeros((len(chunk),), np.float32)
                        mask[:valid] = 1.0
                        q.put((imgs, labels, mask))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class Loader:
    """Training/eval loader yielding device-ready batches.

    train=True: shuffled (per-epoch seed), drop_last, device augmentation.
    train=False: ordered, final batch padded with a ``valid`` mask (exact
    top-1 counting — fixes the reference OrderedDistributedSampler's silent
    uneven shards, distributed_sampler.py:55).
    """

    def __init__(self, dataset, batch_size: int, train: bool,
                 image_size: int = 224, workers: int = 8,
                 mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
                 interpolation: str = "random", crop_pct: float = 0.875,
                 scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3), hflip: float = 0.5,
                 vflip: float = 0.0, color_jitter: Optional[float] = 0.4,
                 auto_augment: Optional[str] = None,
                 reprob: float = 0.0, remode: str = "pixel", recount: int = 1,
                 num_aug_splits: int = 0, dtype=jnp.float32, seed: int = 0,
                 mesh=None, tf_preprocessing: bool = False,
                 worker_procs: bool = False, aug_backend: str = "host",
                 draft_decode: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.workers = workers
        self.seed = seed
        self.epoch = 0
        self.mesh = mesh
        self.worker_procs = worker_procs
        self._pool = None  # lazy; persists across epochs
        dataset.draft_size = None  # (re)set below; the dataset is shared
        if train:
            # Policy augments (RandAugment/AutoAugment/AugMix) default to
            # the HOST workers (PIL, reference transforms_factory.py:86-98
            # semantics): TPU general gathers are near-serial, putting the
            # on-device path at ~4.2 s/batch of device time for the five
            # affine ops + equalize (r4, tools/loader_bench.py) while PIL
            # costs ~2-4 ms/image and scales with worker processes.
            # aug_backend="device" restores the jnp in-graph path.
            # num_aug_splits (AugMix JSD) keeps the device path: the split
            # semantics are implemented there.
            host_aug = None
            if (aug_backend == "host" and auto_augment
                    and not num_aug_splits and not tf_preprocessing):
                from cotnet_tpu.data.host_augment import create_host_augment
                host_aug = create_host_augment(auto_augment)
            if tf_preprocessing:
                # TF-graph-parity host transform (reference loader.py:155,
                # transforms_factory.py:196-198); policy augments still
                # apply on device below.  No draft decode: the TF goldens
                # pin the full-resolution decode.
                from cotnet_tpu.data.tf_preprocessing import TfTrainPreprocess
                dataset.transform = TfTrainPreprocess(
                    image_size, hflip=hflip,
                    interpolation=interpolation
                    if interpolation != "random" else "bicubic")
            else:
                dataset.transform = create_train_transform(
                    image_size, scale, ratio, hflip, vflip, interpolation,
                    color_jitter=None if auto_augment else color_jitter,
                    policy_augment=host_aug)
                if draft_decode:
                    # decode-at-scale with a 2x quality margin: the RRC
                    # crop resamples to image_size anyway; only images
                    # larger than 2x the target take the DCT downscale
                    dataset.draft_size = (2 * image_size, 2 * image_size)
            from cotnet_tpu.data.auto_augment import create_batch_augment
            ra = (None if host_aug is not None
                  else create_batch_augment(auto_augment))
            re_ = (RandomErasing(reprob, mode=remode, count=recount,
                                 num_splits=num_aug_splits)
                   if reprob > 0 else None)
            self.device_augment = make_device_augment(
                mean, std, ra, re_, dtype, num_aug_splits=num_aug_splits)
        else:
            if tf_preprocessing:
                from cotnet_tpu.data.tf_preprocessing import TfEvalPreprocess
                dataset.transform = TfEvalPreprocess(
                    image_size,
                    interpolation if interpolation != "random" else "bicubic")
            else:
                dataset.transform = create_eval_transform(
                    image_size, crop_pct,
                    interpolation if interpolation != "random" else "bicubic")
                if draft_decode:
                    # eval decodes + resizes at FULL resolution otherwise —
                    # measured slower per image than the whole train path
                    # (LOADER_r04: 245 vs 293 img/s/core).  Draft to the
                    # resize target: the shorter side lands >= scale_size,
                    # the bicubic resize then only downscales.
                    import math as _math
                    ss = int(_math.floor(image_size / crop_pct))
                    dataset.draft_size = (ss, ss)
            self.device_augment = make_device_augment(mean, std, None, None,
                                                      dtype)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        n = len(self.dataset)
        if self.train:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        if self.train:
            rng = np.random.RandomState(self.seed + self.epoch)
            indices = rng.permutation(n)
        else:
            indices = np.arange(n)
        rng_key = jax.random.PRNGKey(self.seed * 1000 + self.epoch)
        if self.worker_procs and self._pool is None:
            self._pool = _spawn_worker_pool(self.dataset, self.workers,
                                            self.seed)
        pre = _Prefetcher(self.dataset, indices, self.batch_size,
                          self.workers, drop_last=self.train,
                          pad_last=not self.train, proc_pool=self._pool,
                          seed=self.seed * 131 + self.epoch)
        for i, (imgs, labels, mask) in enumerate(pre):
            key = jax.random.fold_in(rng_key, i)
            batch_u8 = jnp.asarray(imgs)
            images = self.device_augment(key, batch_u8)
            batch = {"image": images, "label": jnp.asarray(labels),
                     "valid": jnp.asarray(mask)}
            if self.mesh is not None:
                from cotnet_tpu.parallel.mesh import shard_batch
                batch = shard_batch(batch, self.mesh)
            yield batch


class SyntheticLoader:
    """Random batches for smoke tests and benches (no reference analog)."""

    def __init__(self, batch_size: int, image_size: int = 224,
                 num_classes: int = 1000, steps: int = 100,
                 dtype=jnp.float32, seed: int = 0, mesh=None):
        self.batch_size, self.image_size = batch_size, image_size
        self.num_classes, self.steps = num_classes, steps
        self.dtype, self.seed, self.mesh = dtype, seed, mesh

    def set_epoch(self, epoch: int):
        pass

    def __len__(self):
        return self.steps

    def __iter__(self):
        key = jax.random.PRNGKey(self.seed)
        images = jax.random.normal(
            key, (self.batch_size, self.image_size, self.image_size, 3),
            self.dtype)
        labels = jnp.arange(self.batch_size, dtype=jnp.int32) % self.num_classes
        batch = {"image": images, "label": labels,
                 "valid": jnp.ones((self.batch_size,), jnp.float32)}
        if self.mesh is not None:
            from cotnet_tpu.parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
        for _ in range(self.steps):
            yield batch
