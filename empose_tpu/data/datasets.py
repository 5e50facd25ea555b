"""Dataset readers + a minimal shuffling batch loader.

Replaces the reference's LMDBDataset/RealDataset + torch DataLoader stack
(reference: empose/data/datasets.py:19-85, train.py:54-69). Sequence corpora
live in EMR record files (see emr.py); real recordings are the
``*_clean.npz`` files. The loader is a plain Python iterator with optional
background-thread prefetch — batch assembly is cheap (windowed zero-copy
reads); all heavy computation (FK, sensor synthesis, noise) happens on-device
inside the jitted train step, which is the TPU-native answer to the
reference's multi-worker DataLoader.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from empose_tpu import constants as C
from empose_tpu.data.batches import AMASSSample, RealSample, collate_amass, collate_real
from empose_tpu.data.emr import EMRReader
from empose_tpu.data.transforms import extract_window


class EMRSequenceDataset:
    """Windowed sequence dataset over an EMR corpus (AMASS / 3DPW).

    Expected record fields: poses (F, 66), betas (10,), trans (F, 3),
    joints (F, 66); meta: id, gender, n_frames.
    """

    def __init__(self, path: str, window_size: Optional[int] = None, window_mode: str = "random",
                 rng: Optional[np.random.RandomState] = None):
        if os.path.isdir(path):
            path = os.path.join(path, "corpus.emr")
        self.reader = EMRReader(path)
        self.window_size = window_size
        self.window_mode = window_mode
        self.rng = rng

    def __len__(self) -> int:
        return len(self.reader)

    def __getitem__(self, i: int) -> AMASSSample:
        meta = self.reader.meta(i)
        n_frames = meta["n_frames"]
        if self.window_size is not None:
            sf, ef = extract_window(n_frames, self.window_size, self.rng, self.window_mode)
        else:
            sf, ef = 0, n_frames
        return AMASSSample(
            meta["id"],
            self.reader.read(i, "poses", sf, ef),
            self.reader.read(i, "betas"),
            self.reader.read(i, "trans", sf, ef),
            fps=C.FPS,
            joints=self.reader.read(i, "joints", sf, ef) if "joints" in self.reader.fields(i) else None,
            gender=meta.get("gender", "unknown"),
        )


class RealDataset:
    """All ``*_clean.npz`` recordings in a directory (reference datasets.py:65-84)."""

    def __init__(self, data_dir: str, normalize: bool = True):
        self.files = sorted(glob.glob(os.path.join(data_dir, "*_clean.npz")))
        if not self.files:
            raise FileNotFoundError(f"No *_clean.npz files found in {data_dir}")
        self.normalize = normalize

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> RealSample:
        s = RealSample.from_npz_clean(self.files[i])
        if self.normalize:
            s.normalize_markers()
        return s


def get_all_offset_files(data_dir: Optional[str] = None) -> Dict[str, str]:
    """{subject_id -> offset npz path} (reference utils.py:149-153)."""
    data_dir = data_dir or C.data_dir_real()
    offset_files = sorted(glob.glob(os.path.join(data_dir, "*_offsets.npz")))
    subject_ids = [os.path.split(o)[-1].split("_")[0] for o in offset_files]
    return dict(zip(subject_ids, offset_files))


class Loader:
    """Shuffling batch iterator with optional background prefetch."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[Dict]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self.collate_fn([self.dataset[int(i)] for i in chunk])

    def __iter__(self) -> Iterator[Dict]:
        yield from _prefetch_iter(self._batches(), self.prefetch)


def _prefetch_iter(gen: Iterator, prefetch: int) -> Iterator:
    """Drain ``gen`` on a background thread, ``prefetch`` items ahead.

    Abandoning the iterator early (``break`` out of the consuming loop, then
    GC/close of this generator) stops the producer promptly: the timed
    ``q.put`` rechecks a stop flag, so the thread exits instead of blocking
    forever on a queue nobody drains. NOTE prefetched-ahead batches that were
    already drawn are discarded — after an early break, any RNG owned by
    ``gen`` has advanced up to ``prefetch + 1`` draws past the last consumed
    batch (identical to torch DataLoader-worker semantics, not to a
    prefetch=0 run)."""
    if prefetch <= 0:
        yield from gen
        return
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    sentinel = object()
    stop = threading.Event()

    def producer():
        def put_checked(item):
            # Same timed-put-with-stop-recheck as regular items: a consumer
            # that abandons the iterator while the queue is full must not
            # leave this thread blocked forever (exception/sentinel included).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for b in gen:
                if not put_checked(b):
                    return
            put_checked(sentinel)
        except BaseException as e:  # surfaced in the consumer, not lost
            put_checked(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def make_real_loader(data_dir: Optional[str] = None, batch_size: int = 1) -> Loader:
    ds = RealDataset(data_dir or C.data_dir_real())
    return Loader(ds, batch_size, collate_real, shuffle=False)


class EMRBatchLoader:
    """Batched training loader on the native gather path (no per-sample objects).

    Produces collated AMASS batch dicts directly from the mmap'd corpus via
    the C++ window gather (empose_tpu/data/emr.py NativeEMRBatcher) — the
    framework's answer to the reference's multi-worker torch DataLoader.
    """

    def __init__(self, path: str, batch_size: int, window_size: int, shuffle: bool = True,
                 seed: int = 0, window_mode: str = "random", pad_multiple: int = 32,
                 drop_last: bool = False, window_rng: Optional[np.random.RandomState] = None,
                 prefetch: int = 0):
        from empose_tpu.data.emr import EMRReader, NativeEMRBatcher
        if os.path.isdir(path):
            path = os.path.join(path, "corpus.emr")
        self.reader = EMRReader(path)
        self.batcher = NativeEMRBatcher(self.reader)
        self.batch_size = batch_size
        self.window_size = window_size
        self.window_mode = window_mode
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        # Window-crop draws come from their own stream (mirroring the
        # reference's dedicated extractor RNG, train.py:43) so shuffle order
        # and crop randomness stay independently seeded/deterministic.
        self.window_rng = window_rng if window_rng is not None else self.rng
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.pad_multiple = pad_multiple
        self.n_frames = np.asarray([self.reader.meta(i)["n_frames"] for i in range(len(self.reader))])
        # The 'joints' field must be homogeneous across the corpus: a mixed
        # corpus would either crash in gather_windows or silently zero-fill
        # records that DO carry joints. Assert at load time, not mid-epoch.
        with_joints = sum("joints" in self.reader.fields(i) for i in range(len(self.reader)))
        if with_joints not in (0, len(self.reader)):
            raise ValueError(
                f"EMR corpus {path!r} is heterogeneous: {with_joints}/"
                f"{len(self.reader)} records have a 'joints' field; "
                "regenerate the corpus with a consistent schema.")
        self.has_joints = with_joints > 0

    def __len__(self) -> int:
        n = len(self.reader)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, indices: np.ndarray) -> Dict:
        nf = self.n_frames[indices]
        lengths = np.minimum(nf, self.window_size).astype(np.int32)
        if self.window_mode == "random":
            span = np.maximum(nf - self.window_size, 0)
            starts = (self.window_rng.rand(len(indices)) * (span + 1)).astype(np.int64)
        elif self.window_mode == "middle":
            starts = np.maximum(nf // 2 - self.window_size // 2, 0).astype(np.int64)
        else:
            starts = np.zeros(len(indices), np.int64)
        pad_f = ((int(lengths.max()) + self.pad_multiple - 1) // self.pad_multiple) * self.pad_multiple

        batch = {
            "ids": [self.reader.meta(int(i))["id"] for i in indices],
            "poses": self.batcher.gather_windows("poses", indices, starts, lengths, pad_f),
            "trans": self.batcher.gather_windows("trans", indices, starts, lengths, pad_f),
            "shapes": self.batcher.gather_fixed("betas", indices),
            "seq_lengths": lengths,
        }
        if self.has_joints:
            batch["joints_gt"] = self.batcher.gather_windows("joints", indices, starts, lengths, pad_f)
        else:  # corpora without precomputed joints (collate_amass zero-fills too)
            batch["joints_gt"] = np.zeros(
                (len(indices), pad_f, (C.N_JOINTS + 1) * 3), np.float32)
        return batch

    def _batches(self) -> Iterator[Dict]:
        idx = np.arange(len(self.reader))
        if self.shuffle:
            self.rng.shuffle(idx)
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self._make_batch(chunk)

    def __iter__(self):
        yield from _prefetch_iter(self._batches(), self.prefetch)
