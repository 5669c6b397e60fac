"""Native (C++) threaded stack reader vs the numpy reference reader."""

import numpy as np
import pytest

from cryo_ralib_tpu import native
from cryo_ralib_tpu.io.mrc import HEADER_SIZE, read_mrc, write_mrc

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_stack_info(tmp_path, rng):
    path = str(tmp_path / "s.mrcs")
    data = rng.standard_normal((7, 24, 16)).astype(np.float32)
    write_mrc(path, data)
    nx, ny, nz, mode, off = native.stack_info(path)
    assert (nx, ny, nz, mode, off) == (16, 24, 7, 2, HEADER_SIZE)


def test_read_slices_float32(tmp_path, rng):
    path = str(tmp_path / "s.mrcs")
    data = rng.standard_normal((130, 32, 32)).astype(np.float32)
    write_mrc(path, data)
    got = native.read_slices(path, np.arange(130))
    np.testing.assert_array_equal(got, data)
    # scattered subset, unordered
    idx = np.array([5, 99, 0, 77, 3])
    np.testing.assert_array_equal(native.read_slices(path, idx), data[idx])


@pytest.mark.parametrize("mode,dtype", [(1, np.int16), (6, np.uint16),
                                        (0, np.int8), (12, np.float16)])
def test_read_modes(tmp_path, rng, mode, dtype):
    path = str(tmp_path / f"m{mode}.mrcs")
    if mode == 12:
        raw = rng.standard_normal((5, 8, 8)).astype(np.float16)
    else:
        info = np.iinfo(dtype)
        raw = rng.integers(info.min, info.max, (5, 8, 8)).astype(dtype)
    # hand-write a header with the right mode
    header = np.zeros(HEADER_SIZE // 4, "<i4")
    header[0:3] = (8, 8, 5)
    header[3] = mode
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(raw.tobytes())
    got = native.read_slices(path, np.arange(5))
    np.testing.assert_allclose(got, raw.astype(np.float32), rtol=0, atol=0)


def test_read_mrc_dispatches_native(tmp_path, rng):
    path = str(tmp_path / "s.mrcs")
    data = rng.standard_normal((70, 16, 16)).astype(np.float32)
    write_mrc(path, data)
    np.testing.assert_array_equal(read_mrc(path, native=True), data)
    np.testing.assert_array_equal(read_mrc(path, native=False), data)
    np.testing.assert_array_equal(read_mrc(path), data)


def test_error_paths(tmp_path):
    with pytest.raises(OSError):
        native.stack_info(str(tmp_path / "missing.mrcs"))
    path = str(tmp_path / "s.mrcs")
    write_mrc(path, np.zeros((2, 8, 8), np.float32))
    with pytest.raises(OSError):
        native.read_slices(path, [5])  # out of range
