"""End-to-end CLI surface tests: invoke the real ``main()`` of
``cli.mref`` / ``cli.reffree`` with argv lists on tiny synthetic HDF
stacks, checking artifacts, header write-back, and the CTF path — the
reference's CLI protocol (README.md:54-59 there) minus mpirun.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cryo_ralib_tpu.cli import mref as cli_mref
from cryo_ralib_tpu.cli import reffree as cli_reffree
from cryo_ralib_tpu.io.eman_hdf import (get_image_count, read_hdf_stack,
                                        write_hdf_stack)
from cryo_ralib_tpu.utils.synthetic import class_templates, scattered_stack


@pytest.fixture()
def stack_files(tmp_path, rng):
    k, nx, n = 2, 64, 16
    base = class_templates(k, nx)
    imgs, cls, _, _ = scattered_stack(base, n, max_shift=1, seed=3)
    imgs = (imgs + rng.normal(0, 0.05, imgs.shape)).astype(np.float32)
    stack = tmp_path / "stack.hdf"
    refs = tmp_path / "refs.hdf"
    write_hdf_stack(str(stack), imgs)
    write_hdf_stack(str(refs), base)
    return str(stack), str(refs), cls


def test_mref_cli_end_to_end(tmp_path, stack_files):
    stack, refs, cls = stack_files
    outdir = str(tmp_path / "out")
    rc = cli_mref.main([stack, refs, outdir, "--ou=24", "--xr=1", "--ts=1",
                        "--maxit=2", "--sampler=gather",
                        "--function=ref_ali2d_no_filter",
                        "--header_writeback"])
    assert rc == 0
    # per-iteration class averages + final params written
    assert os.path.exists(os.path.join(outdir, "aqm000.hdf"))
    assert os.path.exists(os.path.join(outdir, "aqm001.hdf"))
    assert os.path.exists(os.path.join(outdir, "final2Dparams.txt"))
    assert get_image_count(os.path.join(outdir, "aqm001.hdf")) == 2
    # header write-back landed xform.align2d + assign on the input stack
    _imgs, headers = read_hdf_stack(stack)
    assert "assign" in headers[0] and "xform.align2d" in headers[0]

    # existing outdir is a hard error, like the reference
    with pytest.raises(SystemExit):
        cli_mref.main([stack, refs, outdir, "--ou=24"])


def test_mref_cli_ctf(tmp_path, stack_files, rng):
    """--CTF --ctf_file drives the premultiply+Wiener path end to end."""
    stack, refs, _cls = stack_files
    n = get_image_count(stack)
    ctf_file = tmp_path / "defocus.txt"
    np.savetxt(ctf_file, rng.uniform(8000, 25000, n)[:, None])
    out_ctf = str(tmp_path / "out_ctf")
    out_plain = str(tmp_path / "out_plain")
    common = ["--ou=24", "--xr=1", "--ts=1", "--maxit=1",
              "--sampler=gather", "--function=ref_ali2d_no_filter"]
    assert cli_mref.main([stack, refs, out_plain] + common) == 0
    assert cli_mref.main([stack, refs, out_ctf] + common
                         + ["--CTF", f"--ctf_file={ctf_file}",
                            "--apix=1.5", "--snr=10"]) == 0
    a, _ = read_hdf_stack(os.path.join(out_plain, "aqm000.hdf"))
    b, _ = read_hdf_stack(os.path.join(out_ctf, "aqm000.hdf"))
    assert not np.allclose(a, b)  # CTF changes results

    # --CTF without --ctf_file fails loudly
    with pytest.raises(SystemExit):
        cli_mref.main([stack, refs, str(tmp_path / "x")] + common + ["--CTF"])


def test_reffree_cli_end_to_end(tmp_path, stack_files):
    stack, _refs, _cls = stack_files
    outdir = str(tmp_path / "out_rf")
    rc = cli_reffree.main([stack, outdir, "--ou=24", "--xr=1", "--ts=1",
                           "--maxit=2", "--sampler=gather",
                           "--function=ref_ali2d_no_filter"])
    assert rc == 0
    for f in ("aqc.hdf", "aqf.hdf", "aqfinal.hdf", "initial2Dparams.txt",
              "resolution001"):
        assert os.path.exists(os.path.join(outdir, f)), f
    params = np.loadtxt(os.path.join(outdir, "initial2Dparams.txt"))
    assert params.shape[0] == get_image_count(stack)

    # every alignment-mode flag is real capability in r3; the one
    # undefined combination (--dst + --random_method) is rejected loudly
    with pytest.raises(SystemExit):
        cli_reffree.main([stack, str(tmp_path / "y"), "--ou=24",
                          "--dst=90", "--random_method=SHC"])

    # H-mode + Fourier variance run end-to-end through the CLI now
    rc = cli_reffree.main([stack, str(tmp_path / "out_h"), "--ou=24",
                           "--xr=1", "--ts=1", "--maxit=1",
                           "--sampler=gather", "--mode=H", "--Fourvar",
                           "--function=ref_ali2d_no_filter"])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path / "out_h", "varf.hdf"))


def test_cli_reference_flag_spellings(tmp_path, stack_files):
    """Reference CLI spellings parse identically here: schedule strings
    for --xr/--yr/--ts (the reference pins N_step=0, so only the first
    entry acts — test_reffree_gpu_align.py:355,750), optparse-float ints
    (--ou=24.0), and the parsed-but-dead --randomize/--orient flags."""
    stack, refs, _cls = stack_files

    args = cli_reffree.build_parser().parse_args(
        [stack, "o", "--xr=4 2 1 1", "--ts=2 1 0.5 0.25", "--ou=24.0",
         "--randomize", "--orient"])
    assert args.xr == 4.0 and args.ts == 2.0 and args.ou == 24
    # per-CLI defaults match the reference parsers
    d_rf = cli_reffree.build_parser().parse_args([stack, "o"])
    assert (d_rf.xr, d_rf.ts, d_rf.center) == (4.0, 2.0, -1)
    d_m = cli_mref.build_parser().parse_args([stack, refs, "o"])
    assert (d_m.xr, d_m.ts, d_m.center) == (0.0, 1.0, 1)

    # and they run end to end (schedule spelling on a real invocation)
    outdir = str(tmp_path / "out_sched")
    rc = cli_reffree.main([stack, outdir, "--ou=24.0", "--xr=1 1",
                           "--ts=1 0.5", "--maxit=1", "--sampler=gather",
                           "--randomize", "--function=ref_ali2d_no_filter"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "aqfinal.hdf"))


def test_cli_maskfile_positional(tmp_path, stack_files):
    """The optional maskfile positional (the reference's extra arg,
    test_mref_gpu_align.py:317-320 / test_reffree_gpu_align.py:947)
    replaces the default model_circle mask."""
    from cryo_ralib_tpu.ops.masks import model_circle

    stack, refs, _cls = stack_files
    mask_path = str(tmp_path / "mask.hdf")
    write_hdf_stack(mask_path, np.asarray(model_circle(10, 64))[None])

    out_m = str(tmp_path / "out_mask")
    out_d = str(tmp_path / "out_default")
    common = ["--ou=24", "--xr=1", "--ts=1", "--maxit=1",
              "--sampler=gather", "--function=ref_ali2d_no_filter"]
    assert cli_mref.main([stack, refs, out_d] + common) == 0
    assert cli_mref.main([stack, refs, out_m, mask_path] + common) == 0
    a, _ = read_hdf_stack(os.path.join(out_d, "aqm000.hdf"))
    b, _ = read_hdf_stack(os.path.join(out_m, "aqm000.hdf"))
    assert not np.allclose(a, b)  # a 10-px mask normalizes differently

    rc = cli_reffree.main([stack, str(tmp_path / "out_rfm"), mask_path]
                          + common)
    assert rc == 0

    # box-size mismatch fails loudly
    bad = str(tmp_path / "bad_mask.hdf")
    write_hdf_stack(bad, np.ones((1, 32, 32), np.float32))
    with pytest.raises(SystemExit):
        cli_mref.main([stack, refs, str(tmp_path / "x2"), bad] + common)
