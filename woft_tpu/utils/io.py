"""Video / flow I/O (host side).

TPU twin of ref:pytracking/utils/io.py: a uniform ``.read()`` over video
files or image directories, and KITTI-style 16-bit png flow storage with
1/32 px quantisation.
"""

import os
from pathlib import Path

import numpy as np


class GeneralVideoCapture:
    """cv2.VideoCapture drop-in that can also read an image directory
    (sorted jpg/png/jpeg, optional reverse) (ref:io.py:145-177)."""

    def __init__(self, path, reverse=False):
        import cv2
        self._cv2 = cv2
        self.image_inputs = Path(path).is_dir()
        if self.image_inputs:
            self.path = str(path)
            exts = (".jpg", ".png", ".jpeg")
            self.images = sorted(
                f for f in next(os.walk(path))[2]
                if os.path.splitext(f)[1].lower() in exts)
            if reverse:
                self.images = self.images[::-1]
            self.i = 0
        else:
            self.cap = cv2.VideoCapture(str(path))

    def read(self):
        if self.image_inputs:
            if self.i >= len(self.images):
                return False, None
            self.frame_src = self.images[self.i]
            img = self._cv2.imread(os.path.join(self.path,
                                                self.images[self.i]))
            self.i += 1
            return True, img
        return self.cap.read()

    def release(self):
        if not self.image_inputs:
            self.cap.release()


def read_flow_png(path):
    """16-bit png flow: (flow (H, W, 2), valid (H, W)) (ref:io.py:109-125)."""
    import cv2
    raw = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    return (flow - 2 ** 15) / 32.0, valid


def write_flow_png(path, flow, valid=None):
    """Quantise flow to 1/32 px and store as 16-bit png (ref:io.py:128-142)."""
    import cv2
    data = 32.0 * flow + 2 ** 15
    if valid is None:
        valid = np.ones((flow.shape[0], flow.shape[1], 1))
    else:
        valid = valid.reshape(flow.shape[0], flow.shape[1], 1)
    packed = np.concatenate([data, valid], axis=2).astype(np.uint16)
    cv2.imwrite(str(path), packed[:, :, ::-1])


class VideoWriter:
    """mp4 or image-sequence writer (ref:vis_utils.py:507-540)."""

    def __init__(self, path, fps=30):
        self.path = Path(path)
        self.fps = fps
        self.writer = None
        self.is_dir = self.path.suffix == ""
        self.i = 0
        if self.is_dir:
            self.path.mkdir(parents=True, exist_ok=True)

    def write(self, frame):
        import cv2
        if self.is_dir:
            cv2.imwrite(str(self.path / f"{self.i:05d}.jpg"), frame)
        else:
            if self.writer is None:
                self.path.parent.mkdir(parents=True, exist_ok=True)
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                self.writer = cv2.VideoWriter(
                    str(self.path), fourcc, self.fps,
                    (frame.shape[1], frame.shape[0]))
            self.writer.write(frame)
        self.i += 1

    def release(self):
        if self.writer is not None:
            self.writer.release()
