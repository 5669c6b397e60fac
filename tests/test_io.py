"""I/O layer: EMAN2-HDF, MRC, STAR, cryoSPARC .cs, params tables, the
HDFfile dataset bundle."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from cryo_ralib_tpu.io import (HDFfile, LazyImage, Starfile, get_image_count,
                               parse_ctf_star, parse_header, read_hdf_stack,
                               read_mrc, read_params_table, update_headers,
                               write_hdf_stack, write_image, write_mrc,
                               write_text_row)
from cryo_ralib_tpu.io.mrc import HEADER_SIZE
from cryo_ralib_tpu.io.star import Table, csparc_get_particles


def test_hdf_roundtrip(tmp_path, rng):
    path = str(tmp_path / "s.hdf")
    imgs = rng.standard_normal((5, 16, 16)).astype(np.float32)
    hdrs = [{"apix_x": 1.2, "note": "p%d" % i} for i in range(5)]
    write_hdf_stack(path, imgs, hdrs)
    assert get_image_count(path) == 5
    back, headers = read_hdf_stack(path)
    np.testing.assert_array_equal(back, imgs)
    assert headers[3]["note"] == "p3"
    assert headers[0]["nx"] == 16
    # EMAN2 on-disk layout
    with h5py.File(path) as f:
        assert "image" in f["MDF"]["images"]["2"]

    # append + indexed read + header update
    write_hdf_stack(path, imgs[:2], append=True)
    assert get_image_count(path) == 7
    sub, _ = read_hdf_stack(path, indices=[5, 6])
    np.testing.assert_array_equal(sub, imgs[:2])
    update_headers(path, [{"assign": 3}], indices=[1])
    _, hdrs2 = read_hdf_stack(path, indices=[1])
    assert hdrs2[0]["assign"] == 3

    # write_image slot semantics
    p2 = str(tmp_path / "one.hdf")
    write_image(p2, imgs[0], 0)
    write_image(p2, imgs[1], 1)
    assert get_image_count(p2) == 2


def test_mrc_roundtrip_and_lazy(tmp_path, rng):
    path = str(tmp_path / "s.mrcs")
    imgs = rng.standard_normal((4, 12, 10)).astype(np.float32)
    write_mrc(path, imgs, apix=1.5)
    hdr = parse_header(path)
    assert (hdr.nx, hdr.ny, hdr.nz) == (10, 12, 4)
    assert hdr.apix == pytest.approx(1.5)
    assert hdr.D == 10
    np.testing.assert_array_equal(read_mrc(path, native=False), imgs)
    np.testing.assert_array_equal(read_mrc(path, indices=[2, 0],
                                           native=False), imgs[[2, 0]])
    li = LazyImage(path, (12, 10), np.float32,
                   HEADER_SIZE + 1 * 12 * 10 * 4)
    np.testing.assert_array_equal(li.get(), imgs[1])


def test_starfile_roundtrip(tmp_path, rng):
    # write particles referenced from an .mrcs
    mrcs = str(tmp_path / "parts.mrcs")
    imgs = rng.standard_normal((3, 8, 8)).astype(np.float32)
    write_mrc(mrcs, imgs)
    star = str(tmp_path / "p.star")
    headers = ["_rlnImageName", "_rlnAnglePsi"]
    cols = {"_rlnImageName": np.array([f"{i+1}@{mrcs}" for i in range(3)],
                                      object),
            "_rlnAnglePsi": np.array(["10.5", "20.0", "330.0"], object)}
    Starfile(headers, Table(headers, cols)).write(star)

    sf = Starfile.load(star)
    assert sf.headers == headers
    assert len(sf.df) == 3
    lazy = sf.get_particles(lazy=True)
    np.testing.assert_allclose(lazy[1].get(), imgs[1], atol=1e-6)
    dense = sf.get_particles(lazy=False)
    np.testing.assert_allclose(dense, imgs, atol=1e-6)


def test_csparc_loader(tmp_path, rng):
    mrcs = str(tmp_path / "parts.mrcs")
    imgs = rng.standard_normal((3, 8, 8)).astype(np.float32)
    write_mrc(mrcs, imgs)
    cs = str(tmp_path / "p.cs")
    rec = np.zeros(3, dtype=[("blob/idx", "<i8"), ("blob/path", "S128"),
                             ("blob/shape", "<i8", (2,))])
    rec["blob/idx"] = [2, 0, 1]
    rec["blob/path"] = mrcs.encode()
    rec["blob/shape"] = [(8, 8)] * 3
    np.save(cs, rec)
    import os
    os.replace(cs + ".npy", cs)
    ds = csparc_get_particles(cs, lazy=False)
    np.testing.assert_allclose(ds, imgs[[2, 0, 1]], atol=1e-6)


def test_params_table_and_dataset(tmp_path, rng):
    stack = str(tmp_path / "s.hdf")
    imgs = rng.standard_normal((4, 16, 16)).astype(np.float32)
    write_hdf_stack(stack, imgs)
    ptab = str(tmp_path / "params.txt")
    rows = np.array([[i, 30.0 * i, 1.0, -1.0, i % 2, i % 3]
                     for i in range(4)])
    write_text_row(rows, ptab)
    t = read_params_table(ptab)
    assert len(t) == 4
    np.testing.assert_allclose(t["angle_psi"], [0, 30, 60, 90])

    ds = HDFfile.load(stack, ptab)
    parts = ds.get_particles()
    np.testing.assert_array_equal(parts, imgs)
    aligned = ds.aligned_particles()
    assert aligned.shape == imgs.shape
    out2 = str(tmp_path / "out.txt")
    ds.write(out2)
    t2 = read_params_table(out2)
    np.testing.assert_allclose(t2["shift_x"], t["shift_x"])


def test_parse_ctf_star():
    cols = {"_rlnDefocusU": np.array(["15000"], object),
            "_rlnDefocusV": np.array(["14000"], object),
            "_rlnDefocusAngle": np.array(["30"], object),
            "_rlnVoltage": np.array(["300"], object),
            "_rlnSphericalAberration": np.array(["2.7"], object),
            "_rlnAmplitudeContrast": np.array(["0.1"], object),
            "_rlnDetectorPixelSize": np.array(["5"], object),
            "_rlnMagnification": np.array(["10000"], object)}
    t = Table(list(cols), cols)
    out = parse_ctf_star(t, d=128)
    assert out.shape == (1, 9)
    assert out[0, 0] == 128
    assert out[0, 1] == pytest.approx(5.0)  # 5*10000/10000
    assert out[0, 2] == 15000
    assert out[0, 6] == pytest.approx(2.7)
