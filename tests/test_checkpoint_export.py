"""Round-trip export test: native params -> torch state_dict ->
reference model strict load -> back to params, bit-identical.

This is what tools/headtohead.py relies on to give the reference tracker
our exact weights (the BASELINE head-to-head accuracy metric)."""

from types import SimpleNamespace

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from conftest import add_reference_raft_path, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)
add_reference_raft_path()

from raft_core.weighted_raft import WeightedRAFT  # noqa: E402

from woft_tpu.models.raft import RaftConfig, init_raft_params  # noqa: E402
from woft_tpu.models.convert import (params_to_torch_statedict,  # noqa: E402
                                     torch_statedict_to_params)


def test_export_strict_loads_into_reference():
    cfg = RaftConfig(variant="weighted")
    params = init_raft_params(jax.random.PRNGKey(3), cfg)
    flat = params_to_torch_statedict(params)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flat.items()}

    args = SimpleNamespace(small=False, mixed_precision=False,
                           alternate_corr=False,
                           weight_head_structure=list(
                               cfg.weight_head_structure),
                           mask_estimation=False)
    net = WeightedRAFT(args)
    net.load_state_dict(sd, strict=True)     # must be complete incl aliases

    # and back: the reimported pytree matches the original bitwise
    back = torch_statedict_to_params(
        {k: v.numpy() for k, v in net.state_dict().items()})

    flat_a = params_to_torch_statedict(params)
    flat_b = params_to_torch_statedict(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)
