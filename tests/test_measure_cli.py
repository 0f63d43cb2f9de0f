"""End-to-end FVD measurement CLI test with a random-weight I3D
checkpoint and synthetic data."""

import glob

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def i3d_ckpt(tmp_path_factory):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pytorch_i3d2", "/root/reference/mebt/fvd/pytorch_i3d.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    ref = mod.InceptionI3d(400, in_channels=3)
    sd = ref.state_dict()
    # random (untrained) conv weights amplify activations to overflow
    # through the 14+ layer stack; damp them so embeddings stay finite
    for k, v in sd.items():
        if k.endswith("conv3d.weight"):
            sd[k] = v * 0.2
    path = tmp_path_factory.mktemp("i3d") / "i3d_rand.pt"
    torch.save(sd, path)
    return str(path)


@pytest.fixture
def frame_data(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path / "frames"
    d.mkdir()
    paths = []
    for vid in range(4):
        for i in range(12):
            p = d / f"v{vid}_{i:04d}.png"
            Image.fromarray(
                rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            ).save(p)
            paths.append(str(p))
    (tmp_path / "train.txt").write_text("\n".join(paths))
    (tmp_path / "test.txt").write_text("\n".join(paths))
    return tmp_path


@pytest.mark.slow
def test_measure_fvd_cli(i3d_ckpt, frame_data, tmp_path):
    from mebt_tpu.cli.measure_fvd import main

    rng = np.random.default_rng(1)
    fake = rng.integers(0, 255, size=(8, 9, 32, 32, 3), dtype=np.uint8)
    np_file = tmp_path / "fake.npy"
    np.save(np_file, fake)

    fvd, kvd = main(
        [
            "--np_file", str(np_file),
            "--data_path", str(frame_data),
            "--sequence_length", "9",
            "--resolution", "32",
            "--batch_size", "4",
            "--num_workers", "1",
            "--image_folder",
            "--n_sample", "8",
            "--i3d_ckpt", i3d_ckpt,
        ]
    )
    assert np.isfinite(fvd) and np.isfinite(kvd)
    assert fvd >= 0
    csvs = glob.glob(str(tmp_path / "fake_consq*.csv"))
    assert csvs


@pytest.mark.slow
def test_measure_sliding_fvd_cli(i3d_ckpt, frame_data, tmp_path):
    from mebt_tpu.cli.measure_sliding_fvd import main

    rng = np.random.default_rng(2)
    fake = rng.integers(0, 255, size=(8, 24, 32, 32, 3), dtype=np.uint8)
    np_file = tmp_path / "fake_long.npy"
    np.save(np_file, fake)

    rows = main(
        [
            "--np_file", str(np_file),
            "--data_path", str(frame_data),
            "--sequence_length", "9",
            "--resolution", "32",
            "--batch_size", "4",
            "--num_workers", "1",
            "--image_folder",
            "--n_sample", "8",
            "--slide", "8",
            "--total_length", "24",
            "--i3d_ckpt", i3d_ckpt,
        ]
    )
    assert rows["t"] == [0, 8]
    assert all(np.isfinite(v) for v in rows["fvd"])
    csvs = glob.glob(str(tmp_path / "fake_long_slide*.csv"))
    assert csvs
