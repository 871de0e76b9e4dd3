import json
import os

import numpy as np
import pandas as pd

from pcc_tpu.io import read_point_cloud, save_point_cloud


def test_off_parser_and_mesh_sampling(tmp_path, rng):
    from pcc_tpu.cli.sample_modelnet import read_off, sample_mesh

    off = tmp_path / "cube.off"
    # unit cube, 12 triangles
    verts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                     dtype=float)
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),
    ]
    lines = ["OFF", f"{len(verts)} {len(faces)} 0"]
    lines += [" ".join(map(str, v)) for v in verts]
    lines += ["3 " + " ".join(map(str, f)) for f in faces]
    off.write_text("\n".join(lines) + "\n")

    v, f = read_off(str(off))
    assert v.shape == (8, 3) and f.shape == (12, 3)
    pts = sample_mesh(v, f, 500, rng)
    assert pts.shape == (500, 3)
    assert pts.min() >= -1e-9 and pts.max() <= 1 + 1e-9
    # all sampled points lie on the cube surface (some coord is 0 or 1)
    on_face = np.isclose(pts, 0).any(axis=1) | np.isclose(pts, 1).any(axis=1)
    assert on_face.all()


def test_sample_modelnet_cli(tmp_path, rng):
    from pcc_tpu.cli import sample_modelnet

    src = tmp_path / "modelnet" / "chair" / "train"
    os.makedirs(src)
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2]], dtype=float)
    faces = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    lines = ["OFF", "4 4 0"]
    lines += [" ".join(map(str, v)) for v in verts]
    lines += ["3 " + " ".join(map(str, f)) for f in faces]
    (src / "chair_0001.off").write_text("\n".join(lines) + "\n")

    dest = tmp_path / "out"
    sample_modelnet.main([str(tmp_path / "modelnet"), str(dest),
                          "--n_point", "256"])
    out = dest / "chair" / "train" / "chair_0001.ply"
    assert out.exists()
    pc = read_point_cloud(str(out))
    assert pc.shape[1] == 3 and len(pc) > 200  # dedupe may drop a few
    assert pc.min() >= 0 and pc.max() <= 1


def test_sample_stanford3d_cli(tmp_path, rng):
    from pcc_tpu.cli import sample_stanford3d

    room = tmp_path / "Area_1" / "office_1"
    os.makedirs(room)
    data = rng.random((100, 6))
    np.savetxt(room / "office_1.txt", data)
    dest = tmp_path / "dest"
    sample_stanford3d.main(["--source", str(tmp_path / "Area_1" / "*" / "*.txt"),
                            "--dest", str(dest)])
    pc = read_point_cloud(str(dest / "office_1.ply"))
    np.testing.assert_allclose(pc, data[:, :3].astype(np.float32), atol=1e-6)


def test_sample_shapenet_cli(tmp_path, rng):
    from pcc_tpu.cli import sample_shapenet

    root = tmp_path / "shapenet"
    os.makedirs(root / "02691156")
    (root / "synsetoffset2category.txt").write_text("Airplane\t02691156\n")
    os.makedirs(root / "train_test_split")
    ids = []
    for i in range(2):
        token = f"model{i}"
        ids.append(f"shape_data/02691156/{token}")
        pts = rng.random((300, 7))
        np.savetxt(root / "02691156" / f"{token}.txt", pts)
    for name, content in (("shuffled_train_file_list.json", []),
                          ("shuffled_val_file_list.json", []),
                          ("shuffled_test_file_list.json", ids)):
        (root / "train_test_split" / name).write_text(json.dumps(content))

    dest = tmp_path / "sn_out"
    sample_shapenet.main(["--source", str(root), "--dest", str(dest),
                          "--n_point", "128", "--split", "test"])
    pc = read_point_cloud(str(dest / "test" / "0.ply"))
    assert pc.shape == (128, 3)
    assert pc.min() >= 0.0  # +0.5 shift applied to [0,1) data


def test_preload_cli(tmp_path, rng):
    from pcc_tpu.cli import preload_pointclouds

    for i in range(3):
        save_point_cloud(rng.random((64, 3)).astype(np.float32),
                         f"c{i}.ply", path=str(tmp_path / "plys"))
    out = tmp_path / "train.npy"
    preload_pointclouds.main(["--train_glob", str(tmp_path / "plys" / "*.ply"),
                              "--output_npy", str(out)])
    arr = np.load(out)
    assert arr.shape == (3, 64, 3)


def test_visualize_cli(tmp_path, rng):
    from pcc_tpu.cli import visualize

    df = pd.DataFrame({
        "filename": [f"f{i}.ply" for i in range(5)],
        "p2pointPSNR": rng.random(5) * 10 + 35,
        "p2planePSNR": rng.random(5) * 10 + 40,
        "chamfer_distance": rng.random(5) * 1e-3,
        "n_points_input": [8192] * 5,
        "n_points_output": [8192] * 5,
        "bpp": rng.random(5) + 0.3,
        "uniformity coefficient": rng.random(5) * 3,
    })
    csv = tmp_path / "eval.csv"
    df.to_csv(csv)
    outdir = tmp_path / "figs"
    visualize.main(["--csv", str(csv), "--outdir", str(outdir)])
    names = os.listdir(outdir)
    assert "bitrate_per_file.png" in names
    assert "psnr_per_file.png" in names
    assert "metrics_pairplot.png" in names
    assert any(n.endswith("_hist.png") for n in names)


def test_compare_classification():
    from pcc_tpu.cli.compare import classify_metric

    # thresholds from compare.py:19-25
    assert classify_metric(42.9, "p2pointPSNR") == "High"
    assert classify_metric(31.0, "p2pointPSNR") == "Medium"
    assert classify_metric(20.0, "p2pointPSNR") == "Low"
    assert classify_metric(0.39, "bpp") == "High"
    assert classify_metric(0.64, "bpp") == "Medium"
    assert classify_metric(2.0, "bpp") == "Low"
    assert classify_metric(2e-4, "chamfer_distance") == "High"
    assert classify_metric(1.0, "point_preservation") == "High"


def test_compare_overall_and_snapshot(tmp_path, rng):
    import matplotlib
    matplotlib.use("Agg")
    from pcc_tpu.cli.compare import PointCloudPager, overall_metrics

    names = [f"f{i}.ply" for i in range(3)]
    df = pd.DataFrame({
        "filename": names,
        "p2pointPSNR": [43.0, 41.0, 44.0],
        "p2planePSNR": [47.0, 48.0, 46.0],
        "chamfer_distance": [2e-4] * 3,
        "n_points_input": [8192] * 3,
        "n_points_output": [8192] * 3,
        "bpp": [0.64] * 3,
    })
    avg = overall_metrics(df, outdir=str(tmp_path / "figs"))
    assert avg["point_preservation"] == 1.0
    assert os.path.exists(tmp_path / "figs" / "metrics_pairplot.png")

    input_dir = tmp_path / "orig" / "cls" / "test"
    recon_dir = tmp_path / "recon"
    os.makedirs(input_dir)
    for n in names:
        save_point_cloud(rng.random((128, 3)).astype(np.float32), n,
                         path=str(input_dir))
        save_point_cloud(rng.random((128, 3)).astype(np.float32), n + ".bin.ply",
                         path=str(recon_dir))
    pager = PointCloudPager(df, str(tmp_path / "orig"), str(recon_dir))
    pager.snapshot(str(tmp_path / "snaps"), limit=2)
    assert os.path.exists(tmp_path / "snaps" / "compare_000.png")
    assert os.path.exists(tmp_path / "snaps" / "compare_001.png")
