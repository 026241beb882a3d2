"""Native C++ data plane (csrc/sps_io.cpp) via ctypes."""

import numpy as np
import pytest

from sps_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


def test_npy_load_roundtrip(built, tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1234, 4)).astype(np.float32)
    p = tmp_path / "a.npy"
    np.save(p, a)
    b = native.load_npy_f32(str(p))
    np.testing.assert_array_equal(a, b)
    # float64 input converts
    np.save(tmp_path / "d.npy", a.astype(np.float64))
    d = native.load_npy_f32(str(tmp_path / "d.npy"))
    np.testing.assert_allclose(a, d, rtol=1e-6)
    # 1-D
    np.save(tmp_path / "v.npy", a[:, 0])
    v = native.load_npy_f32(str(tmp_path / "v.npy"))
    np.testing.assert_array_equal(v[:, 0], a[:, 0])


def test_replayer_prefetch(built, tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    sizes = [100, 300, 50]
    arrays = []
    for i, n in enumerate(sizes):
        a = rng.normal(size=(n, 4)).astype(np.float32)
        p = str(tmp_path / f"s{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    rep = native.Replayer(paths, cap_rows=200, cols=4, depth=2)
    got = list(rep)
    rep.close()
    assert len(got) == 3
    for (out, rows), a in zip(got, arrays):
        assert rows == min(len(a), 200)
        np.testing.assert_array_equal(out[:rows], a[:rows])
        assert (out[rows:] == 0).all()


def test_radius_join_cpu_matches_bruteforce(built):
    rng = np.random.default_rng(2)
    scan = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    query = rng.uniform(-3.5, 3.5, (700, 3)).astype(np.float32)
    r = 0.3
    mask = native.radius_join_cpu(scan, query, r)
    d2 = ((query[:, None, :] - scan[None, :, :]) ** 2).sum(-1)
    want = d2.min(axis=1) <= r * r
    np.testing.assert_array_equal(mask, want)
