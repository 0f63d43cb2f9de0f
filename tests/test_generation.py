"""Generation CLI smoke tests (random weights, tiny model)."""

import glob
import os
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

@pytest.fixture
def tiny_cfg(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(
        textwrap.dedent(
            """
            model:
                target: mebt.transformer.Net2NetTransformer
                params:
                    unconditional: True
                    vocab_size: 64
                    first_stage_vocab_size: 64
                    block_size: 64
                    n_layer: 2
                    n_head: 2
                    n_embd: 16
                    sos_emb: 4
                    vtokens: False
                    mode:
                        - latent_enc
                        - latent_dec
                mask:
                    target: mebt.mask_sampler.MaskGen
                    params:
                        schedule: linear
                        max_token: 64
                        method: 'mlm'
                        shape: [4, 4, 4]
                        budget: 64
                vqvae:
                    params:
                        ckpt_path: 'unused.ckpt'
            data:
                data_path: 'unused'
                sequence_length: 16
                resolution: 32
                batch_size: 2
                image_folder: True
            exp:
                exact_lr: 1e-4
            """
        )
    )
    return cfg


def test_sample_cli_smoke(tiny_cfg, tmp_path, monkeypatch):
    from mebt_tpu.cli.sample import main

    monkeypatch.chdir(tmp_path)
    main(
        [
            "--base", str(tiny_cfg),
            "--random_weights",
            "--n_sample", "4",
            "--batch_size", "2",
            "--vid_n_steps", "4",
            "--total_length", "16",
            "--step_size", "16",
            "--save", str(tmp_path / "out"),
            "--save_codemap",
            "--save_videos",
            "--save_n", "1",
            "--dataset", "stl",
        ]
    )
    npys = glob.glob(str(tmp_path / "out" / "numpy_files_16" / "stl" / "*.npy"))
    data = [np.load(f) for f in npys if "codemap" not in f and "score" not in f]
    assert data and data[0].shape == (4, 16, 32, 32, 3)
    assert data[0].dtype == np.uint8
    codemaps = [np.load(f) for f in npys if "codemap" in f]
    assert codemaps and codemaps[0].shape == (4, 4, 4, 4)
    gifs = glob.glob(str(tmp_path / "out" / "videos_16" / "stl" / "*" / "*.gif"))
    assert gifs


def test_sample_cli_sliding_window(tiny_cfg, tmp_path):
    from mebt_tpu.cli.sample import main

    main(
        [
            "--base", str(tiny_cfg),
            "--random_weights",
            "--n_sample", "2",
            "--batch_size", "2",
            "--vid_n_steps", "4",
            "--bootstrap", "4",
            "--total_length", "32",   # 2 windows with context shift
            "--step_size", "16",
            "--context_size", "12",
            "--save", str(tmp_path / "out2"),
            "--dataset", "stl",
            "--no_np",
            "--save_codemap",
        ]
    )
    npys = glob.glob(
        str(tmp_path / "out2" / "numpy_files_32" / "stl" / "*codemap.npy")
    )
    codes = np.load(npys[0])
    assert codes.shape == (2, 8, 4, 4)  # 32 pixel frames -> 8 latent


def test_dnr_cli_with_np_draft(tiny_cfg, tmp_path):
    from mebt_tpu.cli.dnr import main

    rng = np.random.default_rng(0)
    draft = rng.integers(0, 64, size=(4, 4, 4, 4)).astype(np.int64)
    draft_path = tmp_path / "draft.npy"
    np.save(draft_path, draft)

    main(
        [
            "--base", str(tiny_cfg),
            "--random_weights",
            "--np_draft", str(draft_path),
            "--n_sample", "4",
            "--batch_size", "2",
            "--n_revise", "4",
            "--revise_t", "0.7",
            "--M", "2",
            "--total_length", "16",
            "--save", str(tmp_path / "dnr"),
            "--dataset", "stl",
        ]
    )
    npys = glob.glob(
        str(tmp_path / "dnr" / "numpy_files_16" / "stl" / "*.npy")
    )
    data = [np.load(f) for f in npys if f.endswith(".npy")]
    assert data and data[0].shape == (4, 16, 32, 32, 3)


def test_sample_cli_extrapolate_base_np(tiny_cfg, tmp_path):
    """--base_np seeds a saved codemap and extends it by window shifts
    (reference extrapolate:95-157, the edit=True path)."""
    from mebt_tpu.cli.sample import main

    rng = np.random.default_rng(1)
    seed_codes = rng.integers(0, 64, size=(2, 4, 4, 4)).astype(np.int64)
    seed_path = tmp_path / "seed_codemap.npy"
    np.save(seed_path, seed_codes)

    main(
        [
            "--base", str(tiny_cfg),
            "--random_weights",
            "--base_np", str(seed_path),
            "--n_sample", "2",
            "--batch_size", "2",
            "--vid_n_steps", "4",
            "--total_length", "32",
            "--step_size", "16",
            "--context_size", "12",
            "--save", str(tmp_path / "extr"),
            "--dataset", "stl",
            "--no_np",
            "--save_codemap",
        ]
    )
    npys = glob.glob(
        str(tmp_path / "extr" / "numpy_files_32" / "stl" / "*codemap.npy")
    )
    codes = np.load(npys[0])
    assert codes.shape == (2, 8, 4, 4)
    # the seed window is preserved verbatim at the front
    np.testing.assert_array_equal(codes[:, :4], seed_codes)
