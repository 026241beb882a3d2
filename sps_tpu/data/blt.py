"""BLT/NCLT dataset module (host side).

Same on-disk contract as the reference's BacchusModule
(/root/reference/src/sps/datasets/blt_dataset.py:25-100): sequences under
$DATA/sequence/<SEQ>/{scans,poses,map_transform}, the base map under
$DATA/maps/. Scans are eagerly loaded and transformed to the map frame on
the host (pose then map_transform, blt_dataset.py:57-75).

Everything downstream of np.load happens **on device**: submap extraction
(sps_tpu.ops.radius replaces the cKDTree at blt_dataset.py:258-271),
augmentation, and batch assembly live in sps_tpu/pipeline.py inside the
jitted train/eval step. The host side only pads scans to the static
capacity and feeds arrays.
"""

from __future__ import annotations

import os

import numpy as np

from sps_tpu import native
from sps_tpu.config import Config


class SequenceData:
    """Scans of one split, map-frame, as host numpy arrays."""

    def __init__(self, scans: list[np.ndarray]):
        self.scans = scans  # each (N_i, 4): [x, y, z, label], map frame

    def __len__(self):
        return len(self.scans)


def _apply(tr: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ tr[:3, :3].T + tr[:3, 3]


def load_sequences(root: str, seqs) -> SequenceData:
    scans = []
    for seq in seqs:
        sdir = os.path.join(root, "sequence", seq)
        scan_dir = os.path.join(sdir, "scans")
        pose_dir = os.path.join(sdir, "poses")
        names = sorted(os.listdir(scan_dir))
        poses = sorted(os.listdir(pose_dir))
        assert len(names) == len(poses), f"scan/pose count mismatch in {seq}"
        map_tr = np.loadtxt(os.path.join(sdir, "map_transform"), delimiter=",")
        for sn, pn in zip(names, poses):
            scan = native.load_npy_f32(os.path.join(scan_dir, sn))
            pose = np.loadtxt(os.path.join(pose_dir, pn), delimiter=",")
            scan[:, :3] = _apply(map_tr, _apply(pose, scan[:, :3]))
            scans.append(scan)
    return SequenceData(scans)


def load_sequences_raw(root: str, seqs) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Sensor-frame scans + ground-truth poses (pose then map_transform
    composed), for localization experiments where the pose is estimated
    rather than given (SURVEY.md §3.4)."""
    scans, poses = [], []
    for seq in seqs:
        sdir = os.path.join(root, "sequence", seq)
        names = sorted(os.listdir(os.path.join(sdir, "scans")))
        pnames = sorted(os.listdir(os.path.join(sdir, "poses")))
        map_tr = np.loadtxt(os.path.join(sdir, "map_transform"), delimiter=",")
        for sn, pn in zip(names, pnames):
            scans.append(native.load_npy_f32(os.path.join(sdir, "scans", sn)))
            pose = np.loadtxt(os.path.join(sdir, "poses", pn), delimiter=",")
            poses.append(map_tr @ pose)
    return scans, poses


def sequence_files(root: str, seq: str) -> tuple[list[str], list[np.ndarray]]:
    """Scan file paths + composed (map_transform @ pose) per scan, WITHOUT
    loading the scans — the streaming replay path hands the paths to the
    native prefetching Replayer (csrc/sps_io.cpp) so sequences larger than
    host RAM stream instead of eager-loading (reference analog: rosbag
    streaming via pub_scans.py)."""
    sdir = os.path.join(root, "sequence", seq)
    scan_dir = os.path.join(sdir, "scans")
    pose_dir = os.path.join(sdir, "poses")
    names = sorted(os.listdir(scan_dir))
    pnames = sorted(os.listdir(pose_dir))
    assert len(names) == len(pnames), f"scan/pose count mismatch in {seq}"
    map_tr = np.loadtxt(os.path.join(sdir, "map_transform"), delimiter=",")
    paths = [os.path.join(scan_dir, sn) for sn in names]
    poses = [
        (map_tr @ np.loadtxt(os.path.join(pose_dir, pn), delimiter=",")).astype(
            np.float32
        )
        for pn in pnames
    ]
    return paths, poses


def prefetched(it, depth: int = 2):
    """Wrap an iterator with a worker thread + bounded queue so the host
    assembles batch i+1 while the device runs step i (the reference gets
    this from DataLoader workers, blt_dataset.py:132)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item


def load_map(root: str, map_file: str) -> np.ndarray:
    """(M, 3) float32 map points (labels, if present, are dropped —
    blt_dataset.py:49-55 keeps [:, :4]; only xyz feeds the pipeline)."""
    path = os.path.join(root, "maps", map_file)
    arr = (
        native.load_npy_f32(path)
        if path.endswith(".npy")
        else np.loadtxt(path, dtype=np.float32)
    )
    return np.ascontiguousarray(arr[:, :3], dtype=np.float32)


class BLTDataModule:
    """Split loading + padded host-side batching."""

    def __init__(self, cfg: Config, test: bool = False):
        self.cfg = cfg
        root = cfg.data.root
        if not root:
            raise ValueError("dataset root not set ($DATA or --data)")
        self.map_points = load_map(root, cfg.data.map_file)
        if test:
            self.test = load_sequences(root, cfg.data.test)
        else:
            self.train = load_sequences(root, cfg.data.train)
            self.val = load_sequences(root, cfg.data.val)

    def batches(self, data: SequenceData, batch_size: int, shuffle: bool, seed: int = 0):
        """Yield host dicts of (B, Ns, ...) padded arrays (last batch padded
        with empty samples so shapes never change)."""
        ns = self.cfg.tpu.scan_points
        idx = np.arange(len(data))
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        for i in range(0, len(idx), batch_size):
            sel = idx[i : i + batch_size]
            xyz = np.zeros((batch_size, ns, 3), np.float32)
            label = np.zeros((batch_size, ns), np.float32)
            valid = np.zeros((batch_size, ns), bool)
            for b, j in enumerate(sel):
                scan = data.scans[j]
                n = min(len(scan), ns)
                if len(scan) > ns:
                    raise ValueError(
                        f"scan {j} has {len(scan)} points > capacity {ns}; "
                        "raise TPU.SCAN_POINTS"
                    )
                xyz[b, :n] = scan[:n, :3]
                label[b, :n] = scan[:n, 3]
                valid[b, :n] = True
            yield {"xyz": xyz, "label": label, "valid": valid, "indices": sel}
