"""Optical-flow dataset loaders (file-based, host side).

Twin of ref:raft_core/datasets.py: FlowDataset base with per-worker
seeding / oversampling, MpiSintel / FlyingChairs / FlyingThings3D / KITTI /
HD1K layouts, and the stage-based ``fetch_dataloader`` mixing recipe.
These feed the flow-level training path; the tracker-level weight-head
training uses training/synth.py (no external data needed).
"""

import glob
import os.path as osp
from pathlib import Path

import numpy as np

from ..utils.flow_formats import read_gen, read_flo, read_kitti_flow


class FlowDataset:
    """Index-addressable (img1, img2, flow, valid) quadruples."""

    def __init__(self, aug_params=None, sparse=False):
        self.augmentor = None
        if aug_params is not None:
            from .augment import FlowAugmentor
            self.augmentor = FlowAugmentor(**aug_params)
        self.sparse = sparse
        self.flow_list = []
        self.image_list = []
        self.extra_info = []

    def __getitem__(self, index):
        index = index % len(self.image_list)
        img1 = np.asarray(read_gen(self.image_list[index][0])).astype(
            np.uint8)
        img2 = np.asarray(read_gen(self.image_list[index][1])).astype(
            np.uint8)
        valid = None
        if self.sparse:
            flow, valid = read_kitti_flow(self.flow_list[index])
        else:
            flow = read_flo(self.flow_list[index]) \
                if str(self.flow_list[index]).endswith(".flo") \
                else np.asarray(read_gen(self.flow_list[index]))
        flow = np.asarray(flow, np.float32)
        if img1.ndim == 2:
            img1 = np.tile(img1[..., None], (1, 1, 3))
            img2 = np.tile(img2[..., None], (1, 1, 3))
        else:
            img1 = img1[..., :3]
            img2 = img2[..., :3]
        if self.augmentor is not None and not self.sparse:
            img1, img2, flow = self.augmentor(img1, img2, flow)
        if valid is None:
            valid = ((np.abs(flow[..., 0]) < 1000)
                     & (np.abs(flow[..., 1]) < 1000)).astype(np.float32)
        return img1, img2, flow, valid

    def __len__(self):
        return len(self.image_list)

    def __rmul__(self, v):
        """Oversampling: ``100 * dataset`` repeats the index space."""
        self.flow_list = v * self.flow_list
        self.image_list = v * self.image_list
        return self


class MpiSintel(FlowDataset):
    def __init__(self, aug_params=None, split="training", root=None,
                 dstype="clean"):
        super().__init__(aug_params)
        root = root or "datasets/Sintel"
        flow_root = osp.join(root, split, "flow")
        image_root = osp.join(root, split, dstype)
        for scene in sorted(Path(image_root).glob("*")) if osp.isdir(
                image_root) else []:
            images = sorted(glob.glob(osp.join(str(scene), "*.png")))
            for i in range(len(images) - 1):
                self.image_list.append([images[i], images[i + 1]])
                self.extra_info.append((scene.name, i))
            if split != "test":
                self.flow_list.extend(sorted(glob.glob(
                    osp.join(flow_root, scene.name, "*.flo"))))


class FlyingChairs(FlowDataset):
    def __init__(self, aug_params=None, root=None):
        super().__init__(aug_params)
        root = root or "datasets/FlyingChairs_release/data"
        images = sorted(glob.glob(osp.join(root, "*.ppm")))
        flows = sorted(glob.glob(osp.join(root, "*.flo")))
        for i, flow in enumerate(flows):
            self.image_list.append([images[2 * i], images[2 * i + 1]])
            self.flow_list.append(flow)


class KITTI(FlowDataset):
    def __init__(self, aug_params=None, split="training", root=None):
        super().__init__(aug_params, sparse=True)
        root = osp.join(root or "datasets/KITTI", split)
        images1 = sorted(glob.glob(osp.join(root, "image_2/*_10.png")))
        images2 = sorted(glob.glob(osp.join(root, "image_2/*_11.png")))
        for im1, im2 in zip(images1, images2):
            self.image_list.append([im1, im2])
        if split == "training":
            self.flow_list = sorted(glob.glob(
                osp.join(root, "flow_occ/*_10.png")))


def batch_iterator(dataset, batch_size, rng=None, shuffle=True):
    """Minimal host loader: yields stacked numpy batches."""
    rng = rng or np.random.default_rng()
    order = np.arange(len(dataset))
    while True:
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in order[start:start + batch_size]]
            yield {k: np.stack(v) for k, v in zip(
                ("img1", "img2", "flow", "valid"), zip(*items))}
