"""Parity of the small-RAFT variant ('orig' RAFT-small) vs torch.

Covers SmallEncoder (bottleneck blocks), SmallMotionEncoder, ConvGRU and
the bilinear upflow8 path (no convex mask head)
(ref:raft_core/raft.py:31-41, extractor.py:195-267, update.py:62-112)."""

from types import SimpleNamespace

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from conftest import add_reference_raft_path, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)
add_reference_raft_path()

from raft_core.raft import RAFT  # noqa: E402  (oracle)

from woft_tpu.models import RaftConfig, torch_statedict_to_params  # noqa: E402
from woft_tpu.models.raft import weighted_raft_forward  # noqa: E402


def test_small_raft_end_to_end():
    torch.manual_seed(0)
    args = SimpleNamespace(small=True, mixed_precision=False,
                           alternate_corr=False, dropout=0)
    net = RAFT(args)
    net.eval()
    net.requires_grad_(False)

    params = torch_statedict_to_params(
        {k: v.numpy() for k, v in net.state_dict().items()})

    rng = np.random.default_rng(0)
    im1 = rng.uniform(0, 255, (1, 128, 192, 3)).astype(np.float32)
    im2 = rng.uniform(0, 255, (1, 128, 192, 3)).astype(np.float32)
    t = lambda x: torch.from_numpy(
        np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        t_low, t_up = net(t(im1), t(im2), iters=3, test_mode=True)

    cfg = RaftConfig(small=True, variant="orig", iters=3)
    out = weighted_raft_forward(params, cfg, jnp.asarray(im1),
                                jnp.asarray(im2))

    up_err = np.abs(np.asarray(out["flow_up"])
                    - t_up.numpy().transpose(0, 2, 3, 1)).max()
    low_err = np.abs(np.asarray(out["flow"])
                     - t_low.numpy().transpose(0, 2, 3, 1)).max()
    assert low_err < 5e-4, low_err
    assert up_err < 5e-3, up_err
