"""Full eval-pipeline integration: maskgit sample (codemap dump) ->
revise-only draft-and-revise consuming the codemap by filename ->
FVD measurement of the refined npy — the valid_dnr_*.sh chain."""

import glob
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def i3d_ckpt(tmp_path_factory):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pytorch_i3d3", "/root/reference/mebt/fvd/pytorch_i3d.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    ref = mod.InceptionI3d(400, in_channels=3)
    sd = ref.state_dict()
    for k, v in sd.items():
        if k.endswith("conv3d.weight"):
            sd[k] = v * 0.2
    path = tmp_path_factory.mktemp("i3d") / "i3d_rand.pt"
    torch.save(sd, path)
    return str(path)


@pytest.mark.slow
def test_valid_dnr_chain(tmp_path, i3d_ckpt):
    from PIL import Image

    rng = np.random.default_rng(0)
    frames_dir = tmp_path / "data"
    frames_dir.mkdir()
    paths = []
    for vid in range(3):
        for i in range(14):
            p = frames_dir / f"v{vid}_{i:04d}.png"
            Image.fromarray(
                rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
            ).save(p)
            paths.append(str(p))
    (frames_dir / "train.txt").write_text("\n".join(paths))
    (frames_dir / "test.txt").write_text("\n".join(paths))

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(
        textwrap.dedent(
            f"""
            model:
                target: mebt.transformer.Net2NetTransformer
                params:
                    unconditional: True
                    vocab_size: 64
                    first_stage_vocab_size: 64
                    block_size: 48
                    n_layer: 2
                    n_head: 2
                    n_embd: 16
                    sos_emb: 4
                    mode: [latent_enc, latent_dec]
                mask:
                    target: mebt.mask_sampler.MaskGen
                    params:
                        schedule: linear
                        max_token: 48
                        method: 'mlm'
                        shape: [3, 4, 4]
                        budget: 48
                vqvae:
                    params:
                        ckpt_path: 'unused.ckpt'
            data:
                data_path: '{frames_dir}'
                sequence_length: 12
                resolution: 24
                batch_size: 2
                num_workers: 1
                image_folder: True
            exp:
                exact_lr: 1e-4
            """
        )
    )

    save = tmp_path / "results"
    # 1) maskgit sample with codemap dump (reference-style tag naming)
    from mebt_tpu.cli.sample import main as sample_main

    sample_main([
        "--base", str(cfg), "--random_weights",
        "--n_sample", "4", "--batch_size", "2",
        "--vid_n_steps", "4", "--schedule", "cosine",
        "--vid_c_temp", "8.0",
        "--total_length", "12", "--step_size", "12", "--context_size", "12",
        "--save", str(save), "--dataset", "stl", "--save_codemap",
    ])
    codemaps = glob.glob(
        str(save / "numpy_files_12" / "stl" / "*maskgit_cosine*_codemap.npy")
    )
    assert codemaps, "sample CLI must dump a codemap"

    # 2) revise-only dnr consuming the codemap (filename parsing path)
    from mebt_tpu.cli.dnr import main as dnr_main

    dnr_main([
        "--base", str(cfg), "--random_weights",
        "--np_draft", codemaps[0],
        "--n_sample", "4", "--batch_size", "2",
        "--n_revise", "4", "--revise_t", "0.7", "--M", "2",
        "--total_length", "12",
        "--save", str(save), "--dataset", "stl",
    ])
    # n_draft + ctemp parsed from the codemap filename like the
    # reference (dnr script:119-132)
    dnr_npys = glob.glob(
        str(save / "numpy_files_12" / "stl" / "VID_dnr_nd4_dt0.0_*ctemp8.0*.npy")
    )
    assert dnr_npys, "dnr output must carry parsed nd/ctemp naming"

    # 3) FVD of the refined samples against the real loader
    from mebt_tpu.cli.measure_fvd import main as measure_main

    fvd, kvd = measure_main([
        "--np_file", dnr_npys[0],
        "--data_path", str(frames_dir),
        "--sequence_length", "12", "--resolution", "24",
        "--batch_size", "4", "--num_workers", "1", "--image_folder",
        "--n_sample", "4", "--i3d_ckpt", i3d_ckpt,
    ])
    assert np.isfinite(fvd) and np.isfinite(kvd)
    csvs = glob.glob(str(save / "numpy_files_12" / "stl" / "*consq*.csv"))
    assert csvs
