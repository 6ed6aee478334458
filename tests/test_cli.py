"""End-to-end CLI smoke tests: every public entry point runs on a tiny
synthetic asset and produces artifacts + a finite PSNR."""

import os

import numpy as np
import pytest


@pytest.fixture()
def tiny_png(tmp_path):
    from nic.data.assets import save_png

    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:32, 0:32].astype(np.float32) / 32
    img = np.stack([x, y, (x + y) / 2], axis=-1)
    img = (img * 255).astype(np.uint8)
    path = str(tmp_path / "toy.png")
    save_png(img, path)
    return path


@pytest.fixture()
def tiny_avi(tmp_path):
    from nic.data.assets import write_timelaps

    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 16, dtype=np.float32)[:, None, None, None]
    y, x = np.mgrid[0:16, 0:16].astype(np.float32) / 16
    base = np.stack([x, y, x * y], axis=-1)[None]
    movie = np.clip(base * (0.5 + 0.5 * t), 0, 1)
    movie = (movie * 255).astype(np.uint8)
    path = str(tmp_path / "toy.avi")
    write_timelaps(movie, path)
    return path


def test_image_compression_cli(tiny_png, tmp_path):
    from nic.cli.image_compression import run

    res = run([
        f"IMAGE_PATH={tiny_png}", "IMAGE_SIZE=32", "NUM_EPOCHS=60",
        "CROP_MIP_LEVEL=4", "NUM_CROPS=2", "FP_BITS=4",
        "FEATURE_PYRAMID_CHANNELS=4", "PE_CHANNELS=4",
        "HIDDEN_LAYER_CHANNELS=16", "INTERVAL_PRINT=30",
        f"OUTPUT_ROOT={tmp_path}/runs",
    ])
    assert len(res["psnr"]) == 1 and np.isfinite(res["psnr"][0])
    assert res["bpp"] > 0
    # artifact + image + printlog exist
    root = str(tmp_path / "runs")
    assert any(f.endswith(".npz") for f in os.listdir(os.path.join(root, "artifacts")))
    assert os.path.isdir(os.path.join(root, "printlog"))


def test_image_compression_cli_load_path(tiny_png, tmp_path):
    from nic.cli.image_compression import run

    common_args = [
        f"IMAGE_PATH={tiny_png}", "IMAGE_SIZE=32", "NUM_EPOCHS=40",
        "CROP_MIP_LEVEL=4", "NUM_CROPS=2", "FP_BITS=4",
        "FEATURE_PYRAMID_CHANNELS=4", "PE_CHANNELS=4",
        "HIDDEN_LAYER_CHANNELS=16", f"OUTPUT_ROOT={tmp_path}/runs",
    ]
    res_train = run(common_args)
    res_load = run(common_args + ["TF_TRAIN_MODEL=False"])
    # decode-from-artifact reproduces the trained PSNR exactly
    assert abs(res_train["psnr"][0] - res_load["psnr"][0]) < 1e-3


def test_image_compression_method2(tiny_avi, tmp_path):
    from nic.cli.image_compression import run

    res = run([
        f"IMAGE_PATH={tiny_avi}", "IMAGE_DIMENSION=3", "COMPRESSION_METHOD=2",
        "IMAGE_SIZE=64", "IMAGE_3D_SIZE=16", "NUM_EPOCHS=30",
        "CROP_MIP_LEVEL=4", "NUM_CROPS=2", "FP_BITS=4",
        "FEATURE_PYRAMID_CHANNELS=4", "PE_CHANNELS=4",
        "HIDDEN_LAYER_CHANNELS=16", f"OUTPUT_ROOT={tmp_path}/runs",
    ])
    assert np.isfinite(res["psnr"][0])
    imgdir = os.path.join(str(tmp_path / "runs"), "image")
    avis = [f for root, _, fs in os.walk(imgdir) for f in fs if f.endswith(".avi")]
    assert avis  # method 2 re-tiles frames into an AVI


def test_image_compression_method3(tiny_avi, tmp_path):
    from nic.cli.image_compression import run

    res = run([
        f"IMAGE_PATH={tiny_avi}", "IMAGE_DIMENSION=3", "COMPRESSION_METHOD=3",
        "IMAGE_SIZE=16", "NUM_EPOCHS=30", "CROP_MIP_LEVEL=3", "NUM_CROPS=2",
        "FP_BITS=4", "FEATURE_PYRAMID_CHANNELS=2", "PE_CHANNELS=4",
        "HIDDEN_LAYER_CHANNELS=16", f"OUTPUT_ROOT={tmp_path}/runs",
    ])
    assert np.isfinite(res["psnr"][0])


def test_image_comp_cli(tiny_png, tmp_path):
    from nic.cli.image_comp import run

    p = run([
        "--image_path", tiny_png, "--image_size", "32", "--num_epochs", "60",
        "--num_bits", "4", "--interval_print", "30",
        "--output_root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(p)
    assert os.path.exists(os.path.join(str(tmp_path / "runs"), "comp"))


def test_movie_lavel_alias(tiny_png, tmp_path):
    from nic.cli.movie_lavel_comp import run

    p = run([
        "--image_path", tiny_png, "--image_size", "32", "--num_epochs", "20",
        "--num_bits", "4", "--output_root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(p)


def test_pixel_comp_cli(tiny_png, tmp_path):
    from nic.cli.pixel_comp import run

    p = run([
        "--image_path", tiny_png, "--image_size", "32", "--num_epochs", "80",
        "--batch_pixels", "64", "--output_root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(p)


def test_pixel_pos_comp_cli(tiny_png, tmp_path):
    from nic.cli.pixel_pos_comp import run

    p = run([
        "--image_path", tiny_png, "--image_size", "32", "--num_epochs", "40",
        "--batch_pixels", "64", "--output_root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(p)


def test_movie_frame_comp_cli(tiny_avi, tmp_path):
    from nic.cli.movie_frame_comp import run

    p = run([
        "--image_path", tiny_avi, "--num_epochs", "40",
        "--output_root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(p)


def test_movie_3d_comp_cli_with_resume(tiny_avi, tmp_path):
    from nic.cli.movie_3d_comp import run

    root = str(tmp_path / "runs")
    p = run([
        "--image_path", tiny_avi, "--num_epochs", "30",
        "--interval_checkpoint", "20", "--output_root", root,
    ])
    assert np.isfinite(p)
    # resume from the step-20 checkpoint (encode_from_middle parity)
    p2 = run([
        "--image_path", tiny_avi, "--num_epochs", "30",
        "--resume_step", "19", "--output_root", root,
    ])
    assert np.isfinite(p2)


def test_image_compression_ndarray_lut(tmp_path):
    """npy LUT input (the reference's Multilayer_para3 datasets are npy
    volumes, sample22-2 lineage) + CSV LUT export."""
    from nic.cli.image_compression import run

    rng = np.random.default_rng(3)
    lut = rng.integers(0, 256, (16, 16, 16, 3)).astype(np.uint8)
    p = str(tmp_path / "lut.npy")
    np.save(p, lut)
    res = run([
        f"IMAGE_PATH={p}", "IMAGE_DIMENSION=3", "COMPRESSION_METHOD=4",
        "IMAGE_SIZE=16", "NUM_EPOCHS=30", "CROP_MIP_LEVEL=3", "NUM_CROPS=2",
        "FP_BITS=4", "FEATURE_PYRAMID_CHANNELS=2", "PE_CHANNELS=4",
        "HIDDEN_LAYER_CHANNELS=16", "SAVE_LUT_CSV=True",
        f"OUTPUT_ROOT={tmp_path}/runs",
    ])
    assert np.isfinite(res["psnr"][0])
    lutdir = os.path.join(str(tmp_path / "runs"), "LUT")
    csvs = [f for root, _, fs in os.walk(lutdir) for f in fs if f.endswith(".csv")]
    assert csvs


def test_image_compression_resume(tiny_png, tmp_path):
    """TF_RESUME continues from the newest checkpoint: a run killed at 40
    steps resumes and finishes identically-shaped to an uninterrupted one."""
    from nic.cli.image_compression import run

    base = [
        f"IMAGE_PATH={tiny_png}", "IMAGE_SIZE=32", "CROP_MIP_LEVEL=4",
        "NUM_CROPS=2", "FP_BITS=4", "FEATURE_PYRAMID_CHANNELS=4",
        "PE_CHANNELS=4", "HIDDEN_LAYER_CHANNELS=16", "INTERVAL_PRINT=20",
        f"OUTPUT_ROOT={tmp_path}/runs",
    ]
    # phase 1: "preempted" run — only 40 of the eventual epochs
    run(base + ["NUM_EPOCHS=40"])
    ckpt_root = os.path.join(str(tmp_path / "runs"), "ckpt")
    assert os.path.isdir(ckpt_root)
    # phase 2: resume to 80 (num_epochs larger, TF_RESUME picks up step 40)
    res = run(base + ["NUM_EPOCHS=80", "TF_RESUME=True"])
    assert np.isfinite(res["psnr"][0])
    # the printlog of the second run must record the resume
    import glob
    logs = sorted(glob.glob(os.path.join(str(tmp_path / "runs"), "printlog", "*_80_*.txt")))
    assert logs and "resumed from" in open(logs[-1]).read()


def test_image_compression_resume_skips_corrupt_newest(tiny_png, tmp_path):
    """A corrupt newest checkpoint (the mid-write-kill scenario) must fall
    back to the previous good snapshot instead of crashing (ADVICE r1)."""
    import glob

    from nic.cli.image_compression import run

    base = [
        f"IMAGE_PATH={tiny_png}", "IMAGE_SIZE=32", "CROP_MIP_LEVEL=4",
        "NUM_CROPS=2", "FP_BITS=4", "FEATURE_PYRAMID_CHANNELS=4",
        "PE_CHANNELS=4", "HIDDEN_LAYER_CHANNELS=16", "INTERVAL_PRINT=20",
        f"OUTPUT_ROOT={tmp_path}/runs",
    ]
    run(base + ["NUM_EPOCHS=40"])  # leaves checkpoints at steps 20, 40
    ckpt_root = os.path.join(str(tmp_path / "runs"), "ckpt")
    ckpts = sorted(glob.glob(os.path.join(ckpt_root, "*", "*.npz")))
    assert len(ckpts) == 2
    with open(ckpts[-1], "wb") as f:
        f.write(b"truncated by preemption")
    res = run(base + ["NUM_EPOCHS=60", "TF_RESUME=True"])
    assert np.isfinite(res["psnr"][0])
    logs = sorted(glob.glob(os.path.join(str(tmp_path / "runs"), "printlog", "*_60_*.txt")))
    text = open(logs[-1]).read()
    assert "unreadable" in text and "resumed from" in text
    assert "at step 20" in text
