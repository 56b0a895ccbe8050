"""C++ native runtime helpers vs their numpy fallbacks."""

import base64

import numpy as np
import pytest

import dealii_adapter_tpu.native as nat
from dealii_adapter_tpu.fem import dofspace


@pytest.fixture
def numpy_plan():
    """The pure-numpy plan builder, with the native path disabled."""

    def build(cells, n_nodes):
        old = nat.build_plan_native
        nat.build_plan_native = lambda *a: None
        try:
            return dofspace.build_transpose_gather_plan(cells, n_nodes)
        finally:
            nat.build_plan_native = old

    return build


def test_native_lib_builds():
    assert nat.get_lib() is not None, "toolchain present but native build failed"


def test_plan_matches_numpy(numpy_plan):
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 777, (321, 16)).astype(np.int32)
    res = nat.build_plan_native(cells, 777)
    assert res is not None
    plan, sent = res
    plan_np, sent_np = numpy_plan(cells, 777)
    assert sent == sent_np
    np.testing.assert_array_equal(plan.astype(np.int64), plan_np)


def test_b64_matches_stdlib():
    data = np.random.default_rng(1).bytes(99991)  # not a multiple of 3
    assert nat.b64_native(data) == base64.b64encode(data).decode()
    assert nat.b64_native(b"") == ""
    assert nat.b64_native(b"a") == base64.b64encode(b"a").decode()
    assert nat.b64_native(b"ab") == base64.b64encode(b"ab").decode()


def test_unique_sorted():
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 100, 1000).astype(np.int32)
    np.testing.assert_array_equal(
        nat.unique_sorted_native(ids, 100), np.unique(ids)
    )
