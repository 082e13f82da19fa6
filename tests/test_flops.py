"""Op-count / MFU accounting sanity (isokann_tpu/utils/flops.py)."""

import numpy as np
import pytest

from isokann_tpu.utils.flops import (
    V5E_PEAK_MXU_BF16, V5E_PEAK_VPU_F32,
    fused_md_flops, gb_md_flops, neighbor_sweep_flops, mlp_train_flops, mfu)


def test_fused_md_flops_ala2():
    """The ala2 fused kernel is matmul-dominated (the D/D^T incidence
    products), with a non-trivial vector component."""
    import isokann_tpu as itk
    from isokann_tpu.md.pallas_md import PallasMDPlan

    plan = PallasMDPlan(itk.MDSimulation(steps=1).system)
    c = fused_md_flops(plan)
    assert c["matmul_flops"] > c["vector_flops"] > 0
    # 22 atoms, 231 pair rows: order-of-magnitude guard against unit bugs
    assert 1e4 < c["vector_flops"] < 1e6
    assert 1e5 < c["matmul_flops"] < 1e7


def test_counts_scale():
    assert gb_md_flops(200)["vector_flops"] == 4 * gb_md_flops(100)["vector_flops"]
    a = neighbor_sweep_flops(1000, 500)["vector_flops"]
    assert a == pytest.approx(1000 * 500 * 60.0)
    m = mlp_train_flops([10, 8, 1], 100)
    assert m["matmul_flops"] == pytest.approx(3.0 * (2*10*8 + 2*8*1) * 100)


def test_mfu_normalization():
    counts = {"matmul_flops": 1e6, "vector_flops": 1e4}
    u = mfu(counts, 1e5)
    assert u["matmul_flops_per_s"] == pytest.approx(1e11)
    assert u["pct_mxu_bf16"] == pytest.approx(1e11 / V5E_PEAK_MXU_BF16)
    assert u["pct_vpu_f32"] == pytest.approx(1e9 / V5E_PEAK_VPU_F32)
    assert u["bound"] == "vpu"   # 1e9/1.9e12 > 1e11/1.97e14
    u2 = mfu({"matmul_flops": 1e8, "vector_flops": 1e2}, 1e5)
    assert u2["bound"] == "mxu"
