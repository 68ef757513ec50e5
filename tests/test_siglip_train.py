"""Mini-SigLIP contrastive training: data, loss, checkpoint, wiring."""

import numpy as np
import pytest

from gvl_tpu.training.siglip_train import (
    CAPTIONS,
    CLASSES,
    MiniSigLIP,
    SigLIPTrainConfig,
    byte_tokenize,
    evaluate_minisiglip,
    is_minisiglip_checkpoint,
    load_minisiglip,
    make_pairs,
    minisiglip_text_config,
    minisiglip_vision_config,
    save_minisiglip,
    sigmoid_contrastive_loss,
    train_minisiglip,
)


def tiny_cfg(**kw):
    base = dict(
        steps=6, batch_size=8, pool_batches=2, canvas=64,
        vision=minisiglip_vision_config(
            hidden_size=32, intermediate_size=64, num_layers=1,
            num_heads=2, image_size=64),
        text=minisiglip_text_config(
            hidden_size=32, intermediate_size=64, num_layers=1,
            num_heads=2, projection_size=32))
    base.update(kw)
    return SigLIPTrainConfig(**base)


def test_byte_tokenize_right_aligned():
    ids = byte_tokenize(["ab"], max_position=8)
    assert ids.shape == (1, 8)
    assert list(ids[0, :6]) == [0] * 6          # left pad
    assert list(ids[0, 6:]) == [ord("a"), ord("b")]
    # lowercasing + truncation
    long = byte_tokenize(["X" * 99], max_position=8)
    assert (long[0] == ord("x")).all()


def test_make_pairs_shapes_and_classes():
    rng = np.random.default_rng(0)
    imgs, caps, cls = make_pairs(rng, 24, canvas=64)
    assert imgs.shape == (24, 64, 64, 3) and imgs.dtype == np.uint8
    assert len(caps) == 24 and cls.shape == (24,)
    # every caption belongs to its class's pool
    for caption, ci in zip(caps, cls):
        assert caption in CAPTIONS[CLASSES[ci]]
    # entity crops dominate, negatives present over a large sample
    imgs2, _, cls2 = make_pairs(rng, 200, canvas=64)
    ent = sum(cls2 < 4)
    assert ent > 100
    assert (cls2 >= 4).any()


def test_compose_caption_space():
    from gvl_tpu.training.siglip_train import (
        HEAD_NOUNS,
        UNSEEN_PROMPTS,
        compose_caption,
    )

    rng = np.random.default_rng(3)
    seen: set[str] = set()
    for _ in range(300):
        for concept in CLASSES:
            cap = compose_caption(concept, rng)
            assert len(cap.encode("utf-8")) <= 32
            seen.add(cap)
    # compositional space is much larger than the fixed pools
    assert len(seen) > 100
    # the paraphrase probe stays a true holdout: its content words
    # never appear in any training caption
    for probe in UNSEEN_PROMPTS.values():
        head = probe.split()[-1]          # protagonist/villain/foe/power-up
        for cap in seen:
            assert head not in cap, (probe, cap)
    for nouns in HEAD_NOUNS.values():
        for noun in nouns:
            for probe in UNSEEN_PROMPTS.values():
                assert probe.split()[-1] not in noun


def test_make_pairs_composed_frac():
    from gvl_tpu.training.siglip_train import CAPTIONS

    rng = np.random.default_rng(5)
    _, caps, cls = make_pairs(rng, 60, canvas=64, composed_frac=1.0)
    pool_hits = sum(c in CAPTIONS[CLASSES[ci]] for c, ci in zip(caps, cls))
    # fully composed: most captions come from outside the fixed pools
    assert pool_hits < len(caps) * 0.5


def test_make_pairs_canonical_mode():
    rng = np.random.default_rng(1)
    _, caps, cls = make_pairs(rng, 12, canvas=64, canonical_captions=True)
    for caption, ci in zip(caps, cls):
        assert caption == CAPTIONS[CLASSES[ci]][0]


def test_sigmoid_loss_multi_positive():
    import jax.numpy as jnp

    # two crops of the same class: +logit between them must LOWER loss
    cls = jnp.asarray([0, 0, 1])
    hi = jnp.asarray([[9.0, 9.0, -9.0], [9.0, 9.0, -9.0],
                      [-9.0, -9.0, 9.0]])
    lo = jnp.asarray([[9.0, -9.0, -9.0], [-9.0, 9.0, -9.0],
                      [-9.0, -9.0, 9.0]])
    assert float(sigmoid_contrastive_loss(hi, cls)) < float(
        sigmoid_contrastive_loss(lo, cls))


def test_train_reduces_loss_and_eval_runs():
    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg()
    variables = train_minisiglip(cfg)
    # loss at init vs trained params on one fixed batch
    model = MiniSigLIP(cfg.vision, cfg.text)
    rng = np.random.default_rng(7)
    imgs, caps, cls = make_pairs(rng, 8, canvas=64)
    px = jnp.asarray(imgs, jnp.float32) / 255.0 * 2 - 1
    ids = jnp.asarray(byte_tokenize(caps, cfg.text.max_position))
    init = model.init(jax.random.PRNGKey(3), px[:1], ids[:1])
    _, _, logits0 = model.apply(init, px, ids)
    _, _, logits1 = model.apply(variables, px, ids)
    l0 = float(sigmoid_contrastive_loss(logits0, jnp.asarray(cls)))
    l1 = float(sigmoid_contrastive_loss(logits1, jnp.asarray(cls)))
    assert l1 < l0

    m = evaluate_minisiglip(variables, cfg.vision, cfg.text,
                            n_crops=16, canvas=64)
    assert set(m) >= {"zero_shot_acc", "entity_acc", "negative_acc",
                      "margin"}
    assert 0.0 <= m["zero_shot_acc"] <= 1.0


def test_checkpoint_roundtrip_and_encoder_wiring(tmp_path):
    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg(steps=2, pool_batches=1)
    variables = train_minisiglip(cfg)
    out = tmp_path / "minisiglip"
    save_minisiglip(variables, out, cfg.vision, cfg.text,
                    metrics={"base": {"zero_shot_acc": 0.5}})
    assert is_minisiglip_checkpoint(out)
    assert not is_minisiglip_checkpoint(tmp_path)

    model, loaded, vcfg, tcfg = load_minisiglip(out)
    assert vcfg.hidden_size == 32 and tcfg.max_position == 32
    px = jnp.zeros((1, 64, 64, 3))
    a = model.apply(variables, px, method=MiniSigLIP.encode_image)
    b = model.apply(loaded, px, method=MiniSigLIP.encode_image)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # semantic-encoder wiring: embeddings at the tower's hidden size,
    # canvas snapped to the training image size
    from gvl_tpu.perception.semantic import SigLIPSemanticEncoder

    enc = SigLIPSemanticEncoder.from_trained_checkpoint(str(out))
    assert enc.config.embedding_dim == 32
    assert enc.config.region_resolution == 64
    frame = np.random.default_rng(0).integers(
        0, 255, (96, 128, 3)).astype(np.uint8)
    mask = np.zeros((96, 128), bool)
    mask[20:50, 30:70] = True
    embs = enc.encode_masked_regions(frame, [("e1", mask)])
    assert embs[0].embedding.shape == (32,)


def test_preset_ladder_picks_trained_checkpoint(tmp_path):
    cfg = tiny_cfg(steps=1, pool_batches=1)
    variables = train_minisiglip(cfg)
    out = tmp_path / "minisiglip"
    save_minisiglip(variables, out, cfg.vision, cfg.text)

    from gvl_tpu.config.presets import load_preset
    from gvl_tpu.perception.batch import build_siglip_encoder

    preset = load_preset("light")
    preset.perception.siglip_checkpoint = str(out)
    preset.perception.siglip_backend = "auto"
    enc = build_siglip_encoder(preset)
    assert enc.config.embedding_dim == 32


@pytest.mark.parametrize("style", ["base", "holdout"])
def test_eval_styles(style):
    cfg = tiny_cfg(steps=1, pool_batches=1)
    variables = train_minisiglip(cfg)
    m = evaluate_minisiglip(variables, cfg.vision, cfg.text,
                            n_crops=12, style=style, canvas=64)
    assert m["style"] == style and m["n"] == 12
