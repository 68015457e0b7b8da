"""CLI integration tests (SURVEY.md §4 'Integration'): the full offline →
online flow through the argparse surface — render views, build a bank,
detect a scene, plus the utility subcommands (crop, edges, segment,
var-desc, visualize)."""
import os

import numpy as np
import pytest

from tpu_joints.cli.main import main as cli
from tpu_joints.core.io import PointData, load_pcd, save_pcd

from tests.util import joint_points


COMMON = ["--preset", "shot", "--descr_rad", "0.12", "--model_ss", "0.04",
          "--scene_ss", "0.04", "--scene_capacity", "1024"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Fully self-provisioned module fixture: model + rendered views + bank.

    Everything later tests read is built HERE, not by earlier tests —
    under pytest-xdist the module's tests are distributed across workers,
    and each worker gets its own tmp dir, so a test must never depend on
    artifacts that a sibling test produced (the round-3 failure mode:
    ``views/`` existed only on the worker that ran test_cli_render).
    """
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    model_xyz, _ = joint_points(rng, n_chord=500, n_stub=300)
    save_pcd(str(d / "model.pcd"), PointData(xyz=model_xyz))
    cli(["render", str(d / "model.pcd"),
         "--out", str(d / "views"), "--level", "0", "--resolution", "64"])
    cli(["bank", str(d / "model.pcd"),
         "--out", str(d / "bank.npz"),
         "--level", "0", "--resolution", "64",
         "--key_capacity", "48",
         "--dump-txt", str(d / "dumps")] + COMMON)
    return d


def test_cli_render(workdir):
    files = os.listdir(workdir / "views")
    assert "pose.txt" in files
    assert sum(f.endswith(".pcd") for f in files) == 12  # level-0 icosphere


def test_cli_bank_and_detect(workdir, capsys):
    assert (workdir / "bank.npz").exists()

    # reference bank-artifact parity: one Partial_View<l>.txt per view,
    # one descriptor component per line (CAD_desc.cpp:354-370)
    from tpu_joints.modelbank import load_bank

    bank = load_bank(str(workdir / "bank.npz"))
    dumps = sorted((workdir / "dumps").glob("Partial_View*.txt"))
    assert len(dumps) == bank.n_views
    D = bank.desc.shape[-1]
    vals = np.loadtxt(str(workdir / "dumps" / "Partial_View0.txt"))
    n_valid = int(np.asarray(bank.key_valid[0]).sum())
    assert vals.size == n_valid * D
    np.testing.assert_allclose(
        vals.reshape(n_valid, D),
        np.asarray(bank.desc[0])[np.asarray(bank.key_valid[0])],
        rtol=1e-4, atol=1e-6)

    # use the largest rendered view as the scene (known recoverable pose)
    views = sorted((workdir / "views").glob("*.pcd"))
    sizes = [(load_pcd(str(p)).xyz.shape[0], p) for p in views]
    scene = max(sizes)[1]

    cli(["detect", str(scene), "--bank", str(workdir / "bank.npz"),
                   "--json", "--png", str(workdir / "out.png")] + COMMON)
    out = capsys.readouterr().out
    assert "accepted=" in out and "fitness=" in out
    assert (workdir / "out.png").exists()

    # -c draws the reference's correspondence-line overlay (SHOT.cpp:524-581)
    cli(["detect", str(scene), "--bank", str(workdir / "bank.npz"), "-c",
                   "--png", str(workdir / "corr.png")] + COMMON)
    assert (workdir / "corr.png").exists()
    assert (workdir / "corr.png").stat().st_size > 10_000


def test_cli_scenes_loop(workdir, capsys):
    views = sorted((workdir / "views").glob("*.pcd"))[:2]
    cli(["scenes"] + [str(v) for v in views]
                  + ["--bank", str(workdir / "bank.npz")] + COMMON)
    out = capsys.readouterr().out
    assert "scenes accepted" in out and out.count("verdict:") == 2


def test_cli_crop_edges(workdir, capsys):
    scene = str(sorted((workdir / "views").glob("*.pcd"))[0])
    cli(["crop", scene, "--out", str(workdir / "crop.pcd"),
                   "--xmin", "-1", "--xmax", "1", "--zmin", "-5", "--zmax", "5"])
    assert load_pcd(str(workdir / "crop.pcd")).xyz.shape[0] > 0

    cli(["edges", scene, "--out", str(workdir / "edges.pcd"),
                   "--leaf", "0", "-k", "20", "--threshold", "0.004"])
    assert (workdir / "edges.pcd").exists()


def test_cli_segment(workdir, capsys):
    rng = np.random.default_rng(1)
    # plane + cylinder scene like segmentation.cpp's tabletop
    plane = np.stack([rng.uniform(-0.5, 0.5, 800), rng.uniform(-0.5, 0.5, 800),
                      np.full(800, 1.0)], 1)
    theta = rng.uniform(0, 2 * np.pi, 600)
    h = rng.uniform(0.5, 0.9, 600)
    cyl = np.stack([0.05 * np.cos(theta), 0.05 * np.sin(theta), h], 1)
    save_pcd(str(workdir / "table.pcd"),
             PointData(xyz=np.concatenate([plane, cyl]).astype(np.float32)))
    cli(["segment", str(workdir / "table.pcd"),
                   "--plane_out", str(workdir / "plane.pcd"),
                   "--cylinder_out", str(workdir / "cyl.pcd"),
                   "--zmin", "0", "--zmax", "1.5"])
    p = load_pcd(str(workdir / "plane.pcd")).xyz
    c = load_pcd(str(workdir / "cyl.pcd")).xyz
    assert p.shape[0] > 500 and abs(p[:, 2].mean() - 1.0) < 0.02
    assert c.shape[0] > 300


def test_cli_var_desc_and_visualize(workdir, capsys):
    scene = str(sorted((workdir / "views").glob("*.pcd"))[0])
    cli(["var-desc", scene, "--out", str(workdir / "var.txt"),
                   "--radius", "0.05", "--sampling", "0.03",
                   "--key_capacity", "64"])
    lines = open(workdir / "var.txt").read().strip().splitlines()
    assert len(lines) > 0 and len(lines) % 3 == 0

    cli(["visualize", scene])
    assert os.path.exists(os.path.splitext(scene)[0] + ".png")
