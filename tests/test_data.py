"""Data layer tests: flattening, END-forcing, shift, loader, prepare flow.

Coverage intent mirrors the reference's dataset self-test
(reference dataset.py:209-292) plus the prepare_dataset CSV conversion and
idempotency behaviors, upgraded to real asserts with synthetic fixtures.
"""

import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from mit_tpu.config import Config
from mit_tpu.data.dataset import ImageTextDataset, Loader, collate, split_indices
from mit_tpu.data.prepare import (
    check_dataset_exists,
    concatenate_parts,
    convert_csv_to_json,
    prepare_flickr30k,
)
from mit_tpu.text.tokenizer import train_tokenizer

ENC = "google/vit-base-patch16-224-in21k"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """5 images, two with multiple captions, one listed-but-missing file."""
    d = tmp_path_factory.mktemp("data")
    cfg = Config(DATA_DIR=str(d), MAX_SEQ_LEN=16)
    os.makedirs(cfg.IMAGE_DIR)
    caps = {}
    for i in range(5):
        name = f"img_{i}.jpg"
        Image.new("RGB", (48, 32), (i * 40, 10, 10)).save(
            os.path.join(cfg.IMAGE_DIR, name)
        )
        caps[name] = [f"caption one for image {i}.", f"caption two for image {i}!"]
    caps["img_0.jpg"].append(12345)      # non-string caption → skipped
    caps["missing.jpg"] = ["this image file does not exist"]
    with open(cfg.CAPTIONS_FILE, "w") as f:
        json.dump(caps, f)
    all_caps = [c for v in caps.values() for c in v if isinstance(c, str)]
    tok = train_tokenizer(iter(all_caps), 300, cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg)
    return cfg, tok


def test_flattening_skips_bad_entries(corpus):
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    # 5 images x 2 captions; the non-string caption and missing image dropped
    assert len(ds) == 10


def test_missing_captions_file_yields_empty(corpus, tmp_path):
    cfg, tok = corpus
    ds = ImageTextDataset(
        cfg.IMAGE_DIR, str(tmp_path / "nope.json"), cfg.MAX_SEQ_LEN, tok, ENC
    )
    assert len(ds) == 0


def test_item_shapes_and_end_forcing(corpus):
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    item = ds[0]
    assert item["image"].shape == (3, 224, 224)
    assert item["caption_tokens"].shape == (cfg.MAX_SEQ_LEN,)
    assert item["caption_tokens"][0] == tok.start_id
    # long caption: truncated to MAX_SEQ_LEN with END forced at the last slot
    long_ids = ds.encode_caption("word " * 100)
    assert long_ids.shape == (cfg.MAX_SEQ_LEN,)
    assert long_ids[-1] == tok.end_id


def test_corrupt_image_returns_dummy(corpus, tmp_path):
    cfg, tok = corpus
    bad = tmp_path / "imgs"
    bad.mkdir()
    with open(bad / "broken.jpg", "wb") as f:
        f.write(b"not a jpeg at all")
    with open(tmp_path / "caps.json", "w") as f:
        json.dump({"broken.jpg": ["a caption"]}, f)
    ds = ImageTextDataset(str(bad), str(tmp_path / "caps.json"), cfg.MAX_SEQ_LEN, tok, ENC)
    item = ds[0]
    assert item["image_path"] == "error_loading_image_path"
    assert (item["caption_tokens"] == tok.pad_id).all()
    assert item["image"].sum() == 0


def test_collate_shift_semantics(corpus):
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    items = [ds[i] for i in range(3)]
    batch = collate(items, tok.pad_id, batch_size=3)
    caps = np.stack([it["caption_tokens"] for it in items])
    np.testing.assert_array_equal(batch["decoder_input_tokens"], caps[:, :-1])
    np.testing.assert_array_equal(batch["target_tokens"], caps[:, 1:])
    assert batch["valid"].all()


def test_collate_pads_partial_batch(corpus):
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    batch = collate([ds[0]], tok.pad_id, batch_size=4)
    assert batch["images"].shape[0] == 4
    assert batch["valid"].tolist() == [True, False, False, False]
    # dummy rows are all-PAD → contribute nothing to PAD-masked CE
    assert (batch["target_tokens"][1:] == tok.pad_id).all()


def test_loader_epoch_coverage_and_static_shapes(corpus):
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    tr, va = split_indices(len(ds), 0.8, seed=0)
    assert len(tr) == 8 and len(va) == 2
    loader = Loader(ds, tr, batch_size=3, shuffle=True, num_workers=2)
    assert len(loader) == 3
    seen = 0
    shapes = set()
    for batch in loader:
        shapes.add(batch["images"].shape)
        seen += int(batch["valid"].sum())
    assert seen == 8
    assert len(shapes) == 1          # static shapes incl. final partial batch


def test_text_only_loader_skips_pixels(corpus):
    """load_images=False: no JPEG decode, token batches match the full
    loader's, and bad_paths items keep the dummy all-PAD semantics."""
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    idx = np.arange(len(ds))
    full = list(Loader(ds, idx, batch_size=4, shuffle=False))
    lean = list(
        Loader(ds, idx, batch_size=4, shuffle=False, load_images=False)
    )
    assert all("images" not in b for b in lean)
    for a, b in zip(full, lean):
        np.testing.assert_array_equal(
            a["decoder_input_tokens"], b["decoder_input_tokens"]
        )
        np.testing.assert_array_equal(a["target_tokens"], b["target_tokens"])
        assert a["image_paths"] == b["image_paths"]

    bad = ds.image_paths[0]
    item = ds.text_item(0, bad_paths={bad})
    assert item["image_path"] == "error_loading_image_path"
    assert (item["caption_tokens"] == tok.pad_id).all()


def test_attach_features_on_text_only_batch(corpus):
    """attach_features works without an 'images' key (cached-feature path)."""
    from mit_tpu.train.features import FeatureCache, attach_features

    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    unique = sorted(set(ds.image_paths))
    feats = np.arange(len(unique) * 2, dtype=np.float32).reshape(
        len(unique), 1, 2
    )
    cache = FeatureCache(feats, {p: i for i, p in enumerate(unique)})
    batch = next(iter(
        Loader(ds, np.arange(3), batch_size=4, shuffle=False,
               load_images=False)
    ))
    out = attach_features(batch, cache)
    assert out["features"].shape == (4, 1, 2)      # padded to static batch
    row = cache.path_to_row[batch["image_paths"][0]]
    np.testing.assert_array_equal(out["features"][0], feats[row])
    assert (out["features"][3] == 0).all()         # pad row → zero features


@pytest.mark.slow
def test_full_sequence_feature_cache_bf16(corpus):
    """Full-sequence mode stores bf16 by default iff the encoder computed
    in bf16 (fp32 otherwise, so the cast never invents rounding the train
    step wouldn't see); lookup returns fp32 features matching an
    fp32-stored cache of the same bf16 compute."""
    import jax
    from mit_tpu.models.decoder import DecoderConfig
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.train.features import FeatureCache

    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    vis = VisionConfig(
        family="vit", image_size=224, patch_size=56, hidden_size=48,
        num_layers=1, num_heads=2, intermediate_size=64,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    )
    dec = DecoderConfig(vocab_size=64, embed_dim=32, num_heads=2, num_layers=1,
                        ff_dim=48, max_seq_len=12, dropout=0.0, pad_idx=0)
    mcfg = ModelConfig("tiny", vis, dec, "full")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)

    import jax.numpy as jnp

    c16 = FeatureCache.build(ds, params["encoder"], mcfg, batch_size=4,
                             num_workers=1, verbose=False,
                             compute_dtype=jnp.bfloat16)
    c32 = FeatureCache.build(ds, params["encoder"], mcfg, batch_size=4,
                             num_workers=1, dtype=np.float32, verbose=False,
                             compute_dtype=jnp.bfloat16)
    cf32 = FeatureCache.build(ds, params["encoder"], mcfg, batch_size=4,
                              num_workers=1, verbose=False)  # fp32 compute
    import ml_dtypes

    assert c16.features.dtype == ml_dtypes.bfloat16
    assert cf32.features.dtype == np.float32   # fp32 compute → fp32 storage
    assert c16.features.shape[1] == vis.seq_len          # full patch sequence
    assert c16.nbytes == c32.nbytes // 2
    paths = sorted(set(ds.image_paths))[:3]
    f16, f32 = c16.lookup(paths), c32.lookup(paths)
    import ml_dtypes as _mld

    # lookup keeps the cache dtype — upcasting bf16 to f32 per batch would
    # double host RAM + H2D bytes just for the train step to cast back down
    assert f16.dtype == _mld.bfloat16
    assert f32.dtype == np.float32
    scale = np.abs(f32).max()
    np.testing.assert_allclose(f16.astype(np.float32), f32,
                               atol=scale / 100.0)       # bf16 mantissa


def test_feature_cache_max_bytes_guard(corpus):
    """The size guard trips BEFORE any encode work and names the numbers."""
    import jax
    from mit_tpu.models.decoder import DecoderConfig
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.train.features import FeatureCache, FeatureCacheTooLarge

    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    vis = VisionConfig(
        family="vit", image_size=224, patch_size=56, hidden_size=48,
        num_layers=1, num_heads=2, intermediate_size=64,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    )
    dec = DecoderConfig(vocab_size=64, embed_dim=32, num_heads=2, num_layers=1,
                        ff_dim=48, max_seq_len=12, dropout=0.0, pad_idx=0)
    mcfg = ModelConfig("tiny", vis, dec, "full")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    with pytest.raises(FeatureCacheTooLarge, match="max_bytes"):
        FeatureCache.build(ds, params["encoder"], mcfg, batch_size=4,
                           num_workers=1, max_bytes=64, verbose=False)


def test_loader_shuffles_between_epochs(corpus):
    cfg, tok = corpus
    ds = ImageTextDataset(cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tok, ENC)
    loader = Loader(ds, np.arange(len(ds)), batch_size=10, shuffle=True)
    e1 = next(iter(loader))["image_paths"]
    e2 = next(iter(loader))["image_paths"]
    assert set(e1) == set(e2)
    assert e1 != e2


# ----------------------------------------------------------------------
# prepare flow
# ----------------------------------------------------------------------
def test_csv_conversion_pipe_with_header(tmp_path):
    src = tmp_path / "results.csv"
    src.write_text(
        "image_name| comment_number| comment\n"
        "a.jpg| 0| A dog runs.\n"
        "a.jpg| 1| A dog sprints.\n"
        "b.jpg| 0| A cat sits.\n"
    )
    out = tmp_path / "captions.json"
    assert convert_csv_to_json(str(src), str(out))
    data = json.loads(out.read_text())
    assert data["a.jpg"] == ["A dog runs.", "A dog sprints."]
    assert data["b.jpg"] == ["A cat sits."]


def test_csv_conversion_comma_no_header(tmp_path):
    src = tmp_path / "captions.txt"
    src.write_text('x.jpg,"A man, smiling."\ny.jpg,Sunset over hills\n')
    out = tmp_path / "caps.json"
    assert convert_csv_to_json(str(src), str(out))
    data = json.loads(out.read_text())
    assert data["x.jpg"] == ["A man, smiling."]
    assert data["y.jpg"] == ["Sunset over hills"]


def test_csv_conversion_empty_fails(tmp_path):
    src = tmp_path / "empty.csv"
    src.write_text("")
    assert not convert_csv_to_json(str(src), str(tmp_path / "o.json"))
    assert not convert_csv_to_json(str(tmp_path / "absent.csv"), str(tmp_path / "o.json"))


def test_part_concatenation_roundtrip(tmp_path):
    """Split a zip into 3 parts, reassemble byte-wise, verify it opens."""
    inner = tmp_path / "Images"
    inner.mkdir()
    Image.new("RGB", (8, 8), "red").save(inner / "z.jpg")
    zpath = tmp_path / "orig.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner / "z.jpg", "Images/z.jpg")
    blob = zpath.read_bytes()
    third = max(1, len(blob) // 3)
    parts = []
    for i in range(3):
        p = tmp_path / f"part{i}"
        p.write_bytes(blob[i * third : (i + 1) * third] if i < 2 else blob[2 * third :])
        parts.append(str(p))
    out = tmp_path / "rejoined.zip"
    concatenate_parts(parts, str(out))
    with zipfile.ZipFile(out) as zf:
        assert zf.namelist() == ["Images/z.jpg"]


def test_prepare_idempotency_gate(corpus):
    cfg, _ = corpus
    assert check_dataset_exists(cfg)
    # with data present, prepare is a no-op returning True (no network touched)
    assert prepare_flickr30k(cfg)


def test_prepare_full_flow_from_local_parts(tmp_path, monkeypatch):
    """Drive the whole pipeline with a synthetic split archive, no network."""
    cfg = Config(DATA_DIR=str(tmp_path / "assets") + "/")
    os.makedirs(cfg.DATA_DIR, exist_ok=True)

    # Build a zip containing images + pipe CSV, split into parts.
    stage = tmp_path / "stage"
    (stage / "flickr30k-images").mkdir(parents=True)
    for i in range(3):
        Image.new("RGB", (8, 8), (i * 50, 0, 0)).save(
            stage / "flickr30k-images" / f"im{i}.jpg"
        )
    (stage / "results.csv").write_text(
        "image_name| comment_number| comment\n"
        + "".join(f"im{i}.jpg| 0| caption {i}\n" for i in range(3))
    )
    zpath = tmp_path / "all.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in stage.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(stage))
    blob = zpath.read_bytes()
    half = len(blob) // 2
    parts_dir = tmp_path / "parts"
    parts_dir.mkdir()
    (parts_dir / "flickr30k_part00").write_bytes(blob[:half])
    (parts_dir / "flickr30k_part01").write_bytes(blob[half:])

    # "download" = copy the local part file
    import mit_tpu.data.prepare as prep

    def fake_download(url, dest, chunk_size=1 << 20):
        import shutil

        shutil.copy(parts_dir / os.path.basename(url), dest)
        return True

    monkeypatch.setattr(prep, "download_file", fake_download)
    ok = prepare_flickr30k(
        cfg, urls=["http://fake/flickr30k_part00", "http://fake/flickr30k_part01"]
    )
    assert ok
    assert check_dataset_exists(cfg)
    assert sorted(os.listdir(cfg.IMAGE_DIR)) == ["im0.jpg", "im1.jpg", "im2.jpg"]
    data = json.loads(open(cfg.CAPTIONS_FILE).read())
    assert data["im1.jpg"] == ["caption 1"]
    assert not os.path.exists(os.path.join(cfg.DATA_DIR, "temp_download"))
