"""CLI contract tests: flags, output file naming, end-to-end flows on a tiny
model (SURVEY.md §4d)."""

import glob
import os
import re
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.test_models import small_cfg


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from morphganformer_tpu.checkpoint.io import save_generator
    from morphganformer_tpu.models import init_generator

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=1)
    path = str(tmp_path_factory.mktemp("ckpt"))
    save_generator(path, cfg, variables)
    return path


def test_generate_cli_outputs(ckpt_dir, tmp_path):
    import cli.generate as G

    out = str(tmp_path / "gen")
    G.run(ckpt_dir, out, images_num=3, truncation_psi=0.7, ratio=1.0,
          batch_size=2)
    files = sorted(os.listdir(out))
    assert files == ["sample_000000.png", "sample_000001.png",
                     "sample_000002.png"]


def test_project_cli_outputs_and_naming(ckpt_dir, tmp_path):
    import cli.generate as G
    import cli.project as P

    gen_dir = str(tmp_path / "gen")
    G.run(ckpt_dir, gen_dir, images_num=1, truncation_psi=0.7, ratio=1.0)
    out = str(tmp_path / "proj")
    args = P.build_parser().parse_args([
        "--model", ckpt_dir, "--img", os.path.join(gen_dir, "sample_000000.png"),
        "--loss", "mse", "--path_to_gen", out, "--step", "60", "--chunk", "30",
        "--n_mean_latent", "256", "--lr", "0.05"])
    res = P.run(args)
    pngs = glob.glob(os.path.join(out, "sample_*.png"))
    assert len(pngs) == 1
    # Reference naming: sample_{step:06d}_{loss:.4f}.png
    assert re.fullmatch(r"sample_\d{6}_\d+\.\d{4}\.png",
                        os.path.basename(pngs[0]))
    assert os.path.exists(os.path.join(out, "w.mat"))
    assert res.best_loss < 1.0


def test_project_adaptive_wing_term(ckpt_dir, tmp_path):
    """--loss awing: heatmap-space adaptive wing loss
    (reference 1024_example_wing_loss_adaptive.py), --lamda sets its
    weight."""
    import cli.generate as G
    import cli.project as P

    gen_dir = str(tmp_path / "gen")
    G.run(ckpt_dir, gen_dir, images_num=1, truncation_psi=0.7, ratio=1.0)
    out = str(tmp_path / "proj_awing")
    args = P.build_parser().parse_args([
        "--model", ckpt_dir, "--img", os.path.join(gen_dir, "sample_000000.png"),
        "--loss", "awing+mse", "--lamda", "0.01", "--random-perceptual",
        "--path_to_gen", out, "--step", "20", "--chunk", "20",
        "--n_mean_latent", "64"])
    res = P.run(args)
    assert np.isfinite(res.best_loss)
    assert glob.glob(os.path.join(out, "sample_*.png"))


def test_project_init_latent_edit_mode(ckpt_dir, tmp_path):
    """edit_MSE-style sequential projection: start from a stored latent."""
    import cli.generate as G
    import cli.project as P
    from morphganformer_tpu.morph import save_latent_mat

    gen_dir = str(tmp_path / "gen")
    G.run(ckpt_dir, gen_dir, images_num=1, truncation_psi=0.7, ratio=1.0)
    w0 = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    save_latent_mat(str(tmp_path / "w0.mat"), w0)
    out = str(tmp_path / "proj2")
    args = P.build_parser().parse_args([
        "--model", ckpt_dir, "--img", os.path.join(gen_dir, "sample_000000.png"),
        "--path_to_gen", out, "--step", "30", "--chunk", "30",
        "--n_mean_latent", "128", "--init-latent", str(tmp_path / "w0.mat")])
    res = P.run(args)
    assert res.latent.shape == (1, 4, 8)


def test_merge_cli(ckpt_dir, tmp_path):
    import cli.merge as M
    from morphganformer_tpu.morph import save_latent_mat

    rng = np.random.RandomState(0)
    save_latent_mat(str(tmp_path / "a.mat"), rng.randn(4, 8).astype(np.float32))
    save_latent_mat(str(tmp_path / "b.mat"), rng.randn(4, 8).astype(np.float32))
    out = str(tmp_path / "merged")
    argv = sys.argv
    sys.argv = ["merge.py", "--model", ckpt_dir, "--latents",
                str(tmp_path / "a.mat"), str(tmp_path / "b.mat"),
                "--out", out]
    try:
        M.main()
    finally:
        sys.argv = argv
    assert sorted(os.listdir(out)) == ["a_b.mat", "a_b.png"]


def test_demorph_latent_mode(ckpt_dir, tmp_path):
    import cli.demorph as D
    from morphganformer_tpu.morph import (
        load_latent_mat, morph_latents, save_latent_mat)

    rng = np.random.RandomState(1)
    w1 = rng.randn(4, 8).astype(np.float32)
    w2 = rng.randn(4, 8).astype(np.float32)
    morph = morph_latents(w1, w2)
    save_latent_mat(str(tmp_path / "m.mat"), morph)
    save_latent_mat(str(tmp_path / "a.mat"), w1)
    out = str(tmp_path / "dem")
    argv = sys.argv
    sys.argv = ["demorph.py", "--model", ckpt_dir, "--morph-latent",
                str(tmp_path / "m.mat"), "--accomplice-latent",
                str(tmp_path / "a.mat"), "--out", out]
    try:
        D.main()
    finally:
        sys.argv = argv
    rec = load_latent_mat(os.path.join(out, "demorph.mat"))
    np.testing.assert_allclose(rec, w2, atol=1e-4)
    assert os.path.exists(os.path.join(out, "demorph.png"))


def test_calc_metrics_morph_qa(tmp_path):
    from PIL import Image

    import cli.calc_metrics as C

    rng = np.random.RandomState(2)
    for d in ("a", "b"):
        os.makedirs(tmp_path / d)
    for i in range(3):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "a" / f"{i}.png")
        Image.fromarray(arr).save(tmp_path / "b" / f"{i}.png")
    result = C.morph_qa(str(tmp_path / "a"), str(tmp_path / "b"))
    assert result["num_pairs"] == 3
    assert result["ssim_mean"] > 0.99
    assert result["psnr_mean"] > 40


def test_warp_identity_and_translation():
    from morphganformer_tpu.morph.warp import (
        border_anchor_points, piecewise_affine_warp)

    rng = np.random.RandomState(3)
    img = rng.rand(32, 32, 3)
    pts = np.concatenate([
        np.array([[10.0, 10.0], [20.0, 12.0], [14.0, 22.0]]),
        border_anchor_points(32)])
    # Identity warp reproduces the image (interior).
    out = piecewise_affine_warp(img, pts, pts)
    np.testing.assert_allclose(out[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-6)

    # Small translation of interior points moves content accordingly.
    dst = pts.copy()
    dst[:3] += 2.0
    out = piecewise_affine_warp(img, pts, dst)
    assert not np.allclose(out[8:24, 8:24], img[8:24, 8:24])


def test_warp_morphs_cli(tmp_path):
    """warp_morphs CLI contract: CSV-landmark mode writes <name>_warped.png
    (reference 1024_warp_morphs.py workflow), batch-list mode too."""
    from PIL import Image

    import cli.warp_morphs as W

    rng = np.random.RandomState(0)
    size = 64
    img = (rng.rand(size, size, 3) * 255).astype("uint8")
    morph_path = str(tmp_path / "pair_morph.png")
    Image.fromarray(img).save(morph_path)

    base = rng.rand(68, 2) * (size * 0.6) + size * 0.2   # interior points
    def save_csv(name, pts):
        p = str(tmp_path / name)
        np.savetxt(p, pts, delimiter=",")
        return p

    csv_m = save_csv("m.csv", base)
    csv_a = save_csv("a.csv", base + 1.5)
    csv_b = save_csv("b.csv", base - 1.5)   # average == base -> near-identity

    out = str(tmp_path / "warped")
    args = W.build_parser().parse_args([
        "--morph", morph_path, "--landmarks-morph", csv_m,
        "--landmarks-a", csv_a, "--landmarks-b", csv_b, "--out", out])
    outputs = W.run(args)
    assert outputs == [os.path.join(out, "pair_morph_warped.png")]
    warped = np.asarray(Image.open(outputs[0]))
    assert warped.shape == img.shape
    # avg(a, b) == morph landmarks -> identity warp (interior preserved).
    assert np.mean(np.abs(warped[8:-8, 8:-8].astype(int)
                          - img[8:-8, 8:-8].astype(int))) < 2.0

    batch = str(tmp_path / "list.txt")
    with open(batch, "w") as f:
        f.write(f"{morph_path},{csv_a},{csv_b},{csv_m}\n")
    args = W.build_parser().parse_args([
        "--batch-list", batch, "--out", str(tmp_path / "warped2")])
    outputs = W.run(args)
    assert len(outputs) == 1 and os.path.exists(outputs[0])


def test_dataset_tool_extract(tmp_path):
    """extract round-trips prepared items back to PNGs (reference
    dataset_tool.py extract subcommand)."""
    from PIL import Image

    import cli.dataset_tool as DT

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            src / f"a{i}.png")
    ds = tmp_path / "ds"
    out = tmp_path / "out"
    DT.create_from_images(str(ds), str(src), 32)
    DT.extract(str(ds), str(out), 32, num=2)
    files = sorted(out.glob("*.png"))
    assert len(files) == 2
    assert Image.open(files[0]).size == (32, 32)


def test_module_summaries():
    """Shape-regression harness (reference print_module_summary,
    SURVEY.md §4.4): tabulate both networks and spot-check layer paths."""
    from morphganformer_tpu.models.config import DiscriminatorConfig
    from morphganformer_tpu.utils.summary import (discriminator_summary,
                                                  generator_summary)

    g = generator_summary(small_cfg())
    assert "mapping" in g and "synth" in g and "Generator" in g
    d = discriminator_summary(DiscriminatorConfig(
        img_resolution=16, channel_base=256, channel_max=32,
        mbstd_group_size=2))
    assert "b16" in d and "b4" in d


def test_make_video_gif_and_list(tmp_path):
    """make_video assembles frames (dir glob and --list file) into an
    animated GIF (reference create_video_frm_images*.py contract)."""
    from PIL import Image

    import cli.make_video as MV

    rng = np.random.RandomState(5)
    frames = []
    for i in range(4):
        p = tmp_path / f"f{i:03d}.png"
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(p)
        frames.append(str(p))
    out = str(tmp_path / "seq.gif")
    MV.write_video(MV.collect_frames(images=str(tmp_path)), out, fps=8)
    img = Image.open(out)
    assert img.is_animated and img.n_frames == 4

    lst = tmp_path / "frames.txt"
    lst.write_text("\n".join(frames[:2]) + "\n")
    got = MV.collect_frames(list_file=str(lst))
    assert got == frames[:2]


def test_morph_cli_batched_pairs_csv(ckpt_dir, tmp_path):
    """CSV-driven multi-pair morphing as ONE batch-2P projection scan
    (cli/morph.py --pairs-per-batch; reference drives pairs sequentially,
    projection_example_v2_percept_morph.py:339-365). Contract: the
    similarity filter drops low-similarity rows; every surviving pair gets
    rec PNGs + mats + a morph PNG/mat."""
    import cli.generate as G
    import cli.morph as M

    gen_dir = str(tmp_path / "gen")
    G.run(ckpt_dir, gen_dir, images_num=4, truncation_psi=0.7, ratio=1.0,
          batch_size=4)
    imgs = sorted(glob.glob(os.path.join(gen_dir, "sample_*.png")))
    csv_path = str(tmp_path / "pairs.csv")
    with open(csv_path, "w") as f:
        f.write("img_a,img_b,similarity\n")
        f.write(f"{imgs[0]},{imgs[1]},0.9\n")
        f.write(f"{imgs[2]},{imgs[3]},0.7\n")
        f.write(f"{imgs[0]},{imgs[2]},0.2\n")      # below threshold: dropped

    out = str(tmp_path / "morphs")
    argv = sys.argv
    sys.argv = ["morph.py", "--model", ckpt_dir, "--pairs-csv", csv_path,
                "--out", out, "--step", "8", "--chunk", "8",
                "--n_mean_latent", "64", "--pairs-per-batch", "2",
                "--dtype", "float32"]
    try:
        M.main()
    finally:
        sys.argv = argv

    files = set(os.listdir(out))
    for a, b in [("sample_000000", "sample_000001"),
                 ("sample_000002", "sample_000003")]:
        assert {f"{a}_rec.png", f"{b}_rec.png", f"{a}.mat", f"{b}.mat",
                f"{a}_{b}_morph.png", f"{a}_{b}_morph.mat"} <= files
    # The dropped pair produced no morph artifact.
    assert "sample_000000_sample_000002_morph.png" not in files
