"""Host -> HBM feeding for batched client updates.

The reference feeds each client from its own torch DataLoader inside a
thread (fedavgclient.py:44-53).  Here one *group feeder* serves a whole
client group: for every epoch it reshuffles each client's index map
(DataLoader(shuffle=True) parity), gathers uint8/int32 columns from the
TaskDataset, stacks them to ``[n_clients, chunk_steps, B, ...]`` and hands
chunks to the jitted update program.  A one-deep background prefetch thread
overlaps host gather/decode with device compute (the double-buffered host
pipeline from BASELINE.json's north star).

Step masks:
* ``step_valid[c, s]`` — client c has ceil(n_c/B) real steps per epoch;
  padded steps are exact no-ops in the optimizer;
* ``valid[c, s, b]`` — the last real batch may be partial
  (DataLoader drop_last=False); losses mean over valid rows only.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

from fedcola_tpu.data.datasets import TaskDataset


@dataclass
class ClientShard:
    """A client's training view: dataset + its index map.  ``test_indices``
    is the local holdout (``--test_size`` > 0; reference
    data.py:137-156/stratified_split) — None when the pre-defined global
    test split is used (test_size == -1, the scripts' setting)."""
    dataset: TaskDataset
    indices: np.ndarray
    test_indices: Optional[np.ndarray] = None

    @property
    def n(self) -> int:
        return len(self.indices)


@dataclass
class AugmentSpec:
    """Host-side train-time augmentations (reference ``_get_transform``,
    data.py:86-134), applied in the reference's Compose order:
    resize -> crop -> rotation -> hflip -> vflip -> color jitter.
    --imnorm (and the final resize to the model input when no crop is
    configured) are handled on device.

    ``resize`` matters only together with ``crop``: the reference resizes
    BEFORE RandomCrop (data.py:93-97), so cropping at the staged native
    resolution would sample materially different crop coverage (and crash
    for crop > native+8)."""
    resize: Optional[int] = None     # Resize((r, r)) BEFORE the crop
    crop: Optional[int] = None       # RandomCrop(crop, padding=4,
    #                                  pad_if_needed=True)
    randrot: Optional[int] = None    # RandomRotation(deg): U(-deg, +deg)
    randhf: Optional[float] = None   # RandomHorizontalFlip(p)
    randvf: Optional[float] = None   # RandomVerticalFlip(p)
    randjit: Optional[float] = None  # ColorJitter(brightness=j, contrast=j)

    @property
    def active(self) -> bool:
        return any(v is not None for v in
                   (self.crop, self.randrot, self.randhf, self.randvf,
                    self.randjit))

    @property
    def device_supported(self) -> bool:
        """Crop and flips run on device inside the HBM-resident gather
        (client_update.device_augment), so those flags keep the resident
        data plane; rotation and color jitter are host-side transforms —
        passing them trades the resident plane for host-fed pixels."""
        return self.randrot is None and self.randjit is None


def _rotate_nearest(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate one HWC image about its center, nearest interpolation,
    fill=0, expand=False (torchvision RandomRotation defaults)."""
    H, W = img.shape[:2]
    a = np.deg2rad(angle_deg)
    cos, sin = np.cos(a), np.sin(a)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(H) - cy, np.arange(W) - cx, indexing="ij")
    # inverse map: output (y, x) samples the input rotated counter-clockwise
    # by ``angle`` (PIL/torchvision convention; bit-exact vs PIL NEAREST)
    sx = np.round(cos * xx - sin * yy + cx).astype(np.int64)
    sy = np.round(sin * xx + cos * yy + cy).astype(np.int64)
    ok = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    out = np.zeros_like(img)
    out[ok] = img[sy[ok], sx[ok]]
    return out


def _color_jitter(img: np.ndarray, j: float,
                  rng: np.random.RandomState) -> np.ndarray:
    """PIL-semantics brightness + contrast jitter (torchvision ColorJitter
    with brightness=contrast=j): factors ~ U(max(0, 1-j), 1+j), the two
    adjustments applied in random order (ColorJitter permutes them)."""
    lo = max(0.0, 1.0 - j)
    fb = rng.uniform(lo, 1.0 + j)
    fc = rng.uniform(lo, 1.0 + j)
    ops = ["b", "c"]
    if rng.rand() < 0.5:
        ops.reverse()
    x = img.astype(np.float32)
    for op in ops:
        if op == "b":
            x = x * fb
        else:
            # ImageEnhance.Contrast: blend against the rounded mean of the
            # ITU-R 601-2 grayscale
            gray = (x[..., 0] * 299 + x[..., 1] * 587 + x[..., 2] * 114) / 1000
            mean = np.floor(gray.mean() + 0.5)
            x = x * fc + mean * (1.0 - fc)
        x = np.clip(x, 0, 255)
    return np.round(x).astype(img.dtype)


def _augment(images: np.ndarray, aug: AugmentSpec,
             rng: np.random.RandomState) -> np.ndarray:
    B = images.shape[0]
    if (aug.crop is not None and aug.resize is not None
            and images.shape[1:3] != (aug.resize, aug.resize)):
        # reference order: Resize((r, r)) BEFORE RandomCrop
        # (data.py:93-97); PIL bilinear like torchvision's
        from PIL import Image
        r = aug.resize
        images = np.stack([np.asarray(Image.fromarray(im).resize(
            (r, r), Image.BILINEAR)) for im in images])
        if images.ndim == 3:                     # 1-channel PIL roundtrip
            images = images[..., None]
    if aug.crop is not None:
        c = aug.crop
        padded = np.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)))
        # pad_if_needed=True (data.py:96): when still smaller than the
        # crop, torchvision pads BOTH sides by the full deficit
        dh = max(c - padded.shape[1], 0)
        dw = max(c - padded.shape[2], 0)
        if dh or dw:
            padded = np.pad(padded, ((0, 0), (dh, dh), (dw, dw), (0, 0)))
        H = padded.shape[1]
        out = np.empty((B, c, c, images.shape[-1]), images.dtype)
        ys = rng.randint(0, H - c + 1, B)
        xs = rng.randint(0, padded.shape[2] - c + 1, B)
        for i in range(B):
            out[i] = padded[i, ys[i]:ys[i] + c, xs[i]:xs[i] + c]
        images = out
    if aug.randrot is not None:
        angles = rng.uniform(-aug.randrot, aug.randrot, B)
        images = np.stack([_rotate_nearest(images[i], angles[i])
                           for i in range(B)])
    if aug.randhf is not None:
        flip = rng.rand(B) < aug.randhf
        images = np.where(flip[:, None, None, None],
                          images[:, :, ::-1, :], images)
    if aug.randvf is not None:
        flip = rng.rand(B) < aug.randvf
        images = np.where(flip[:, None, None, None],
                          images[:, ::-1, :, :], images)
    if aug.randjit is not None:
        images = np.stack([_color_jitter(images[i], aug.randjit, rng)
                           for i in range(B)])
    return images


def _gather_batch(ds: TaskDataset, idx: np.ndarray, B: int, modality: str,
                  aug: Optional[AugmentSpec] = None,
                  aug_rng: Optional[np.random.RandomState] = None):
    """Gather one batch, padding to B with repeated index 0 rows."""
    nb = len(idx)
    pad = B - nb
    if pad:
        idx = np.concatenate([idx, np.repeat(idx[:1] if nb else [0], pad)])
    valid = np.zeros((B,), bool)
    valid[:nb] = True
    out: Dict[str, np.ndarray] = {"valid": valid}
    if modality == "img":
        out["x"] = ds.load_images(idx)
        out["y"] = ds.targets[idx].astype(np.int32)
    elif modality == "txt":
        out["x"] = ds.texts[idx]
        out["y"] = ds.targets[idx].astype(np.int32)
    else:  # img+txt: token ids ride the target slot (fedavgclient.py:92-95)
        out["x"] = ds.load_images(idx)
        out["y"] = ds.texts[idx]
    if aug is not None and "x" in out and out["x"].ndim == 4:
        out["x"] = _augment(out["x"], aug, aug_rng)
    return out


class GroupFeeder:
    """Produces per-epoch chunked, stacked batches for one client group."""

    def __init__(self, shards: List[ClientShard], B: int, modality: str,
                 chunk_steps: int = 8, shuffle: bool = True,
                 rng: Optional[np.random.RandomState] = None,
                 debug_two_batches: bool = False,
                 aug: Optional[AugmentSpec] = None):
        self.shards = shards
        self.B = B if B > 0 else max(s.n for s in shards)
        self.modality = modality
        self.chunk_steps = chunk_steps
        self.shuffle = shuffle
        self.aug = aug
        self.rng = rng or np.random.RandomState(0)
        self.steps_per_client = np.array(
            [min(-(-s.n // self.B), 2) if debug_two_batches
             else -(-s.n // self.B) for s in shards])
        self.max_steps = int(self.steps_per_client.max())
        self.debug_two_batches = debug_two_batches

    @staticmethod
    def _bucket(steps: int, chunk_steps: int) -> int:
        """Pad a ragged tail chunk up to the next power-of-two bucket
        (capped at ``chunk_steps``).  Chunk shapes feed jitted programs:
        without bucketing, every round's sampled-client mix yields a new
        max-step count -> a new (n, S) shape -> a fresh XLA compile (tens
        of seconds on TPU, every round).  With it, a group compiles at most
        log2(chunk_steps)+1 step-count variants, ever; padded steps are
        exact no-ops via ``step_valid``."""
        b = 1
        while b < steps:
            b *= 2
        return min(b, chunk_steps)

    def epoch_chunks(self) -> Iterator[Dict[str, np.ndarray]]:
        """Yield chunks of stacked batches covering one epoch."""
        B, S = self.B, self.max_steps
        orders = []
        for shard in self.shards:
            order = shard.indices.copy()
            if self.shuffle:
                self.rng.shuffle(order)
            orders.append(order)

        for start in range(0, S, self.chunk_steps):
            stop = min(start + self.chunk_steps, S)
            stop_padded = start + self._bucket(stop - start, self.chunk_steps)
            chunk_per_client = []
            for c, shard in enumerate(self.shards):
                batches = []
                pad_batch = None       # zeros; shared across masked steps
                for s in range(start, stop_padded):
                    if s < self.steps_per_client[c]:
                        idx = orders[c][s * B:(s + 1) * B]
                        b = _gather_batch(shard.dataset, idx, B,
                                          self.modality, self.aug, self.rng)
                    else:
                        if pad_batch is None:
                            idx = orders[c][:1] if shard.n else np.array([0])
                            # probe WITH the aug chain: crop changes the
                            # image shape, and padded steps must stack
                            # with real (augmented) batches
                            one = _gather_batch(shard.dataset, idx, 1,
                                                self.modality, self.aug,
                                                self.rng)
                            pad_batch = {
                                k: np.zeros((B,) + v.shape[1:], v.dtype)
                                for k, v in one.items()}
                        b = pad_batch
                    batches.append(b)
                stacked = {k: np.stack([b[k] for b in batches])
                           for k in batches[0]}
                stacked["step_valid"] = (
                    np.arange(start, stop_padded) < self.steps_per_client[c])
                chunk_per_client.append(stacked)
            yield {k: np.stack([cc[k] for cc in chunk_per_client])
                   for k in chunk_per_client[0]}

    def _epoch_step_streams(self, epochs: int):
        """Per-client step streams over ``epochs`` independent reshuffled
        epochs (the reference's per-client ``for e: for batch`` loops,
        fedavgclient.py:67-75 — clients never epoch-sync).  Shared by the
        host-fed and index-only round iterators.  Returns
        (streams, totals, max_total)."""
        B = self.B
        streams: List[List[np.ndarray]] = []
        for c, shard in enumerate(self.shards):
            steps: List[np.ndarray] = []
            for _ in range(epochs):
                order = shard.indices.copy()
                if self.shuffle:
                    self.rng.shuffle(order)
                for s in range(self.steps_per_client[c]):
                    steps.append(order[s * B:(s + 1) * B])
            streams.append(steps)
        totals = [len(st) for st in streams]
        return streams, totals, max(totals)

    def round_chunks(self, epochs: int) -> Iterator[Dict[str, np.ndarray]]:
        """Stream all ``epochs`` local epochs as fixed-shape chunks.

        Each client advances through its own reshuffled epochs
        independently (exactly the reference's per-client
        ``for e in range(E): for batch in loader`` loops,
        fedavgclient.py:67-75 — clients never epoch-sync with each other);
        the concatenated step stream is cut into chunks of exactly
        ``chunk_steps``.  One (n_clients, chunk_steps) chunk shape per
        group means the jitted update program compiles ONCE per group,
        no matter which clients are sampled in later rounds; only the
        round's final chunk carries padded (masked, exact-no-op) steps."""
        B = self.B
        streams, totals, max_total = self._epoch_step_streams(epochs)
        Sc = self.chunk_steps
        n_chunks = -(-max_total // Sc)
        for ci in range(n_chunks):
            lo = ci * Sc
            chunk_per_client = []
            for c in range(len(self.shards)):
                ds = self.shards[c].dataset
                batches = []
                pad_batch = None
                for s in range(lo, lo + Sc):
                    if s < totals[c]:
                        b = _gather_batch(ds, streams[c][s], B,
                                          self.modality, self.aug, self.rng)
                    else:
                        if pad_batch is None:
                            # probe WITH the aug chain (shape-changing
                            # crop; see epoch_chunks)
                            one = _gather_batch(
                                ds, streams[c][0][:1] if totals[c]
                                else np.array([0]), 1, self.modality,
                                self.aug, self.rng)
                            pad_batch = {
                                k: np.zeros((B,) + v.shape[1:], v.dtype)
                                for k, v in one.items()}
                        b = pad_batch
                    batches.append(b)
                stacked = {k: np.stack([b[k] for b in batches])
                           for k in batches[0]}
                stacked["step_valid"] = np.arange(lo, lo + Sc) < totals[c]
                chunk_per_client.append(stacked)
            yield {k: np.stack([cc[k] for cc in chunk_per_client])
                   for k in chunk_per_client[0]}


    def round_index_chunks(self, epochs: int) -> Iterator[Dict[str, np.ndarray]]:
        """Index-only variant of :meth:`round_chunks` for the HBM-resident
        data plane: yields ``{"idx": [n, chunk_steps, B] int32, "valid",
        "step_valid"}`` — the actual rows are gathered ON DEVICE from
        dataset arrays staged once into HBM.  This collapses per-round
        host->device traffic from gigabytes of pixels to kilobytes of
        indices (the host link is orders of magnitude slower than HBM).
        Same per-client independent epoch streaming as round_chunks."""
        B = self.B
        streams, totals, max_total = self._epoch_step_streams(epochs)
        Sc = self.chunk_steps
        n = len(self.shards)
        for ci in range(-(-max_total // Sc)):
            lo = ci * Sc
            idx = np.zeros((n, Sc, B), np.int32)
            valid = np.zeros((n, Sc, B), bool)
            step_valid = np.zeros((n, Sc), bool)
            for c in range(n):
                for j in range(Sc):
                    s = lo + j
                    if s >= totals[c]:
                        continue
                    rows = streams[c][s]
                    idx[c, j, :len(rows)] = rows
                    if len(rows) < B and len(rows):
                        idx[c, j, len(rows):] = rows[0]
                    valid[c, j, :len(rows)] = True
                    step_valid[c, j] = True
            yield {"idx": idx, "valid": valid, "step_valid": step_valid}


class Prefetcher:
    """One-deep background prefetch: overlap host gather/decode with device
    compute.  Feeder exceptions (decode errors, bad index maps) are carried
    across the thread boundary and re-raised in the consumer, so a failing
    data pipeline aborts the round instead of silently truncating the
    epoch."""

    def __init__(self, it: Iterator, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.it = it
        self._sentinel = object()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for item in self.it:
                self.q.put(item)
            self.q.put(self._sentinel)
        except BaseException as e:  # noqa: BLE001 — re-raised in __next__
            self.q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._sentinel:
            self.thread.join()
            raise StopIteration
        if isinstance(item, BaseException):
            self.thread.join()
            raise item
        return item
