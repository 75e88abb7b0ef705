"""Dataset loaders mirroring the reference example drivers.

- TUM monocular: ``rgb.txt`` index (reference ``Examples/Monocular/mono_tum.cc:128-156``)
- KITTI odometry: ``sequences/NN/image_0/*.png`` + ``times.txt``
  (``Examples/Monocular/mono_kitti.cc:LoadImages``)
- EuRoC: ``mav0/cam0/data`` + timestamp list (``mono_euroc.cc``)
- TUM RGB-D associations (``Examples/RGB-D/associations/*.txt``)

Each loader yields ``(timestamp, image_path)`` or dicts; image decode is via
imageio/cv2 on host (IO is host-side by design — the TPU path starts at the
uint8 image array).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if im is None:
        raise FileNotFoundError(path)
    return im


@dataclass
class ImageSequence:
    timestamps: List[float]
    image_paths: List[str]
    depth_paths: Optional[List[str]] = None

    def __len__(self):
        return len(self.timestamps)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        for ts, p in zip(self.timestamps, self.image_paths):
            yield ts, _imread_gray(p)

    def frame(self, i: int) -> Tuple[float, np.ndarray]:
        return self.timestamps[i], _imread_gray(self.image_paths[i])


def load_tum_mono(sequence_dir: str) -> ImageSequence:
    """Parse ``rgb.txt`` (``mono_tum.cc:128-156`` LoadImages)."""
    ts, paths = [], []
    with open(os.path.join(sequence_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, rel = line.split()[:2]
            ts.append(float(t))
            paths.append(os.path.join(sequence_dir, rel))
    return ImageSequence(ts, paths)


def load_kitti_mono(sequence_dir: str) -> ImageSequence:
    times_path = os.path.join(sequence_dir, "times.txt")
    with open(times_path) as f:
        ts = [float(line) for line in f if line.strip()]
    img_dir = os.path.join(sequence_dir, "image_0")
    paths = [os.path.join(img_dir, f"{i:06d}.png") for i in range(len(ts))]
    return ImageSequence(ts, paths)


def load_euroc_mono(sequence_dir: str, timestamp_file: str) -> ImageSequence:
    with open(timestamp_file) as f:
        stamps = [line.strip() for line in f if line.strip()]
    img_dir = os.path.join(sequence_dir, "mav0", "cam0", "data")
    ts = [float(s) / 1e9 for s in stamps]
    paths = [os.path.join(img_dir, s + ".png") for s in stamps]
    return ImageSequence(ts, paths)


@dataclass
class StereoSequence:
    """Paired left/right image lists (KITTI image_0/image_1, EuRoC cam0/cam1)."""

    timestamps: List[float]
    left_paths: List[str]
    right_paths: List[str]

    def __len__(self):
        return len(self.timestamps)

    def frame(self, i: int) -> Tuple[float, np.ndarray, np.ndarray]:
        return (self.timestamps[i], _imread_gray(self.left_paths[i]),
                _imread_gray(self.right_paths[i]))


def load_kitti_stereo(sequence_dir: str) -> StereoSequence:
    """KITTI odometry stereo pairs (``Examples/Stereo/stereo_kitti.cc``
    LoadImages: image_0 = left gray, image_1 = right gray)."""
    with open(os.path.join(sequence_dir, "times.txt")) as f:
        ts = [float(line) for line in f if line.strip()]
    l_dir = os.path.join(sequence_dir, "image_0")
    r_dir = os.path.join(sequence_dir, "image_1")
    left = [os.path.join(l_dir, f"{i:06d}.png") for i in range(len(ts))]
    right = [os.path.join(r_dir, f"{i:06d}.png") for i in range(len(ts))]
    return StereoSequence(ts, left, right)


def load_euroc_stereo(sequence_dir: str, timestamp_file: str) -> StereoSequence:
    """EuRoC stereo (``Examples/Stereo/stereo_euroc.cc``): cam0/cam1 +
    timestamp list.  NOTE: raw EuRoC needs rectification; supply rectified
    data or accept approximate row alignment."""
    with open(timestamp_file) as f:
        stamps = [line.strip() for line in f if line.strip()]
    ts = [float(s) / 1e9 for s in stamps]
    l_dir = os.path.join(sequence_dir, "mav0", "cam0", "data")
    r_dir = os.path.join(sequence_dir, "mav0", "cam1", "data")
    left = [os.path.join(l_dir, s + ".png") for s in stamps]
    right = [os.path.join(r_dir, s + ".png") for s in stamps]
    return StereoSequence(ts, left, right)


@dataclass
class RGBDSequence:
    """Associated RGB + depth image lists (TUM association format)."""

    timestamps: List[float]
    rgb_paths: List[str]
    depth_paths: List[str]

    def __len__(self):
        return len(self.timestamps)

    def frame(self, i: int) -> Tuple[float, np.ndarray, np.ndarray]:
        import cv2

        depth = cv2.imread(self.depth_paths[i], cv2.IMREAD_UNCHANGED)
        if depth is None:
            raise FileNotFoundError(self.depth_paths[i])
        return (self.timestamps[i], _imread_gray(self.rgb_paths[i]),
                depth.astype(np.float32))


def load_tum_rgbd_assoc(sequence_dir: str, association_file: str) -> RGBDSequence:
    """Associations file ``t_rgb rgb_path t_depth depth_path``
    (``Examples/RGB-D/rgbd_tum.cc`` LoadImages)."""
    ts, rgb, depth = [], [], []
    with open(association_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split()
            ts.append(float(v[0]))
            rgb.append(os.path.join(sequence_dir, v[1]))
            depth.append(os.path.join(sequence_dir, v[3]))
    return RGBDSequence(ts, rgb, depth)


def load_tum_rgbd(sequence_dir: str, association_file: str) -> ImageSequence:
    """Associations file: ``t_rgb rgb_path t_depth depth_path`` (rgbd_tum.cc)."""
    ts, rgb, depth = [], [], []
    with open(association_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split()
            ts.append(float(v[0]))
            rgb.append(os.path.join(sequence_dir, v[1]))
            depth.append(os.path.join(sequence_dir, v[3]))
    return ImageSequence(ts, rgb, depth)
