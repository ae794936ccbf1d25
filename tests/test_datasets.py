"""Dataset-layout + stage-mixing tests against fabricated directory trees
(ref:raft_core/datasets.py:18-234, utils/augmentor.py:122-246)."""

import numpy as np
import pytest

from woft_tpu.training.datasets import (FlowDataset, FlyingChairs,
                                        FlyingThings3D, HD1K, KITTI,
                                        MpiSintel, fetch_dataloader)
from woft_tpu.training.augment import (SparseFlowAugmentor,
                                       resize_sparse_flow_map)
from woft_tpu.utils.flow_formats import (write_flo, write_pfm,
                                         write_kitti_flow)

H, W = 40, 56


def _img(path, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 255, (H, W, 3), np.uint8))


def _ppm(path, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 255, (H, W, 3), np.uint8))


def _flow():
    return np.stack([np.full((H, W), 1.5, np.float32),
                     np.full((H, W), -0.5, np.float32)], -1)


@pytest.fixture()
def trees(tmp_path):
    """Fabricate minimal Sintel/Chairs/Things/KITTI/HD1K trees."""
    # Sintel
    s = tmp_path / "Sintel"
    for dstype in ("clean", "final"):
        d = s / "training" / dstype / "alley_1"
        d.mkdir(parents=True)
        for i in range(3):
            _img(d / f"frame_{i:04d}.png", i)
    f = s / "training/flow/alley_1"
    f.mkdir(parents=True)
    for i in range(2):
        write_flo(f / f"frame_{i:04d}.flo", _flow())

    # FlyingChairs
    c = tmp_path / "FlyingChairs_release/data"
    c.mkdir(parents=True)
    for i in (1, 2):
        _ppm(c / f"{i:05d}_img1.ppm", i)
        _ppm(c / f"{i:05d}_img2.ppm", i + 10)
        write_flo(c / f"{i:05d}_flow.flo", _flow())

    # FlyingThings3D
    t = tmp_path / "FlyingThings3D"
    for dstype in ("frames_cleanpass", "frames_finalpass"):
        d = t / dstype / "TRAIN/A/0000/left"
        d.mkdir(parents=True)
        for i in range(3):
            _img(d / f"{i:04d}.png", i)
    fd = t / "optical_flow/TRAIN/A/0000"
    for direction in ("into_future", "into_past"):
        d = fd / direction / "left"
        d.mkdir(parents=True)
        for i in range(3):
            write_pfm(d / f"{i:04d}.pfm",
                      np.concatenate([_flow(),
                                      np.zeros((H, W, 1), np.float32)], -1))

    # KITTI
    k = tmp_path / "KITTI/training"
    (k / "image_2").mkdir(parents=True)
    (k / "flow_occ").mkdir(parents=True)
    for i in range(2):
        _img(k / f"image_2/{i:06d}_10.png", i)
        _img(k / f"image_2/{i:06d}_11.png", i + 5)
        write_kitti_flow(k / f"flow_occ/{i:06d}_10.png", _flow())

    # HD1K
    h = tmp_path / "HD1k"
    (h / "hd1k_input/image_2").mkdir(parents=True)
    (h / "hd1k_flow_gt/flow_occ").mkdir(parents=True)
    for i in range(3):
        _img(h / f"hd1k_input/image_2/000000_{i:04d}.png", i)
        write_kitti_flow(h / f"hd1k_flow_gt/flow_occ/000000_{i:04d}.png",
                         _flow())
    return tmp_path


def test_things_layout(trees):
    ds = FlyingThings3D(root=str(trees / "FlyingThings3D"))
    # 2 usable flows per direction (len(flows)-1 = 2) x 2 directions
    assert len(ds) == 4
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (H, W, 3) and flow.shape == (H, W, 2)
    assert np.allclose(flow[0, 0], [1.5, -0.5], atol=1e-3)
    # into_past flips the pair order
    fut = ds.image_list[0]
    past = ds.image_list[2]
    assert fut[0] != past[0] or fut[1] != past[1]


def test_hd1k_layout(trees):
    ds = HD1K(root=str(trees / "HD1k"))
    assert len(ds) == 2
    img1, img2, flow, valid = ds[0]
    assert valid.shape == (H, W)
    assert np.allclose(flow[valid > 0][0], [1.5, -0.5], atol=1 / 32)


def test_stage_mix_recipe(trees):
    roots = {"sintel": str(trees / "Sintel"),
             "things": str(trees / "FlyingThings3D"),
             "kitti": str(trees / "KITTI/training").rsplit("/", 1)[0],
             "hd1k": str(trees / "HD1k"),
             "chairs": str(trees / "FlyingChairs_release/data")}
    size = (32, 48)

    ds, it = fetch_dataloader("chairs", size, 2, roots=roots,
                              rng=np.random.default_rng(0))
    assert len(ds) == 2
    batch = next(it)
    assert batch["img1"].shape == (2, *size, 3)

    # the C+T+K+S+H oversampled mix: 100*2 + 100*2 + 200*2 + 5*2 + 4
    ds, it = fetch_dataloader("sintel", size, 2, roots=roots,
                              rng=np.random.default_rng(0))
    assert len(ds) == 100 * 2 + 100 * 2 + 200 * 2 + 5 * 2 + 4
    batch = next(it)
    assert batch["img1"].shape == (2, *size, 3)
    assert batch["flow"].shape == (2, *size, 2)

    ds, _ = fetch_dataloader("things", size, 1, roots=roots)
    assert len(ds) == 8    # clean + final


def test_sparse_augmentor_preserves_sparsity():
    rng = np.random.default_rng(3)
    flow = np.zeros((H, W, 2), np.float32)
    valid = np.zeros((H, W), np.float32)
    valid[10:20, 10:30] = 1
    flow[10:20, 10:30] = [2.0, 1.0]
    f2, v2 = resize_sparse_flow_map(flow, valid, fx=1.5, fy=1.5)
    assert f2.shape == (60, 84, 2)
    # scatter, never interpolated: all valid values are exactly scaled
    vals = f2[v2 > 0]
    assert np.allclose(vals, [3.0, 1.5])
    # invalid area stays zero (no bleeding)
    assert np.all(f2[v2 == 0] == 0)

    aug = SparseFlowAugmentor(crop_size=(32, 48))
    img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    i1, i2, f, v = aug(img, img.copy(), flow, valid,
                       rng=np.random.default_rng(0))
    assert i1.shape == (32, 48, 3) and f.shape == (32, 48, 2)
    assert v.shape == (32, 48)
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_concat_and_oversample(trees):
    a = MpiSintel(root=str(trees / "Sintel"), dstype="clean")
    b = KITTI(root=str(trees / "KITTI"))
    mixed = 3 * a + b
    assert len(mixed) == 3 * 2 + 2
    # leaf resolution returns the right element types
    i1, i2, f, v = mixed[len(mixed) - 1]    # a KITTI item
    assert v.shape == (H, W)
    i1, i2, f, v = mixed[0]                 # a Sintel item
    assert f.shape == (H, W, 2)
