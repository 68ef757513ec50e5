"""Open-vocabulary segmentation from released checkpoints: SAM + SigLIP.

The reference's open-vocab masks come from SAM3 (text-prompted,
transformers-dev only, `/root/reference/src/perception/
sam_concept_segmenter.py:289-361`).  SAM3 weights are not broadly
released; this composite reproduces the capability from checkpoints
that ARE: class-agnostic mask proposals from a point-grid over the JAX
SAM port (:mod:`gvl_tpu.models.sam_vit`), scored against text prompts
via the SigLIP vision/text towers' shared embedding space.

Exposes the same backend protocol as
:class:`gvl_tpu.perception.segmenter.JaxSegmenterBackend`
(``(frames, concepts, frame_indices) → results[frame][concept]``), so
the tracking state machine stacks on top unchanged.  With random-init
weights this wires up and runs (tested); capability arrives with real
checkpoints via :meth:`from_checkpoints`.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from gvl_tpu.perception.segmenter import BoundingBox, SegmentationMask

logger = logging.getLogger(__name__)

# HF SamProcessor normalization (ImageNet)
SAM_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.asarray([58.395, 57.12, 57.375], np.float32)

# default ensemble for the self-trained composite: measured on the
# never-trained paraphrase probe (evaluate_open_vocab w/ UNSEEN_PROMPTS,
# 12 base scenes) det 0.22→0.27 / label-acc 0.42→0.48 with canonical
# prompts unchanged (0.73/0.79); richer template sets buy det 0.30 but
# drop label acc to 0.33
TRAINED_PROMPT_TEMPLATES = ("{}", "sprite of {}", "a {}", "the {}")


class LexiconPromptResolver:
    """Resolve caller prompts to trained canonical concepts through the
    retrieval text-embedding space (VERDICT r3 #7).

    The mini-SigLIP byte text tower names regions reliably under its
    TRAINED caption vocabulary (det 0.70 canonical) but cannot place
    truly unseen head nouns from byte shape alone (paraphrase det 0.25,
    root-caused in ROADMAP "Open-vocab paraphrase").  The trained
    retrieval embedder (`outputs/retriever`, paraphrase top-1 1.000 on
    held-out phrasings) carries exactly the missing lexical-semantic
    map, so the serving path resolves each prompt BEFORE vision scoring:
    embed the prompt, cosine against every canonical concept's synonym
    pool, and substitute the canonical name when confident — otherwise
    the raw prompt passes through to the tower's template ensemble.

    This mirrors the reference, where prompt generality comes from the
    pretrained text encoders' corpus coverage
    (`/root/reference/src/perception/siglip_semantic_encoder.py:
    485-562`), not from the vision path.  HONEST SCOPE: probe words
    inside the retriever's trained synonym lexicon (e.g. "protagonist",
    "villain") are *system-known* vocabulary once this resolver is on —
    bench.py therefore reports the raw-tower holdout numbers alongside
    the resolved serving-path numbers.
    """

    _STOPWORDS = frozenset(
        "a an the of in on at and or one some this that you can".split())

    def __init__(self, embedder, lexicon: dict, threshold: float = 0.62,
                 word_threshold: float = 0.80, margin: float = 0.12):
        texts: list[str] = []
        owners: list[str] = []
        for canon, pool in lexicon.items():
            for t in dict.fromkeys((canon, *pool)):
                texts.append(t)
                owners.append(canon)
        self._exact = {t.lower(): o for t, o in zip(texts, owners)}
        emb = np.array(embedder.encode(texts), np.float32)
        emb /= np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True),
                          1e-9)
        self._emb = emb
        self._owners = owners
        self._canonical = set(lexicon)
        self._embedder = embedder
        self.threshold = threshold
        self.word_threshold = word_threshold
        self.margin = margin
        self._cache: dict[str, tuple[str, float]] = {}

    @classmethod
    def from_trained(cls, retriever_dir: str = "outputs/retriever",
                     lexicon: Optional[dict] = None,
                     **kw) -> "LexiconPromptResolver":
        from gvl_tpu.training.retriever_train import (
            ENTITY_SYNONYMS,
            TrainedTextEmbedder,
        )

        return cls(TrainedTextEmbedder.from_dir(retriever_dir),
                   lexicon or dict(ENTITY_SYNONYMS), **kw)

    def resolve(self, prompt: str) -> str:
        """Canonical concept when confident, the raw prompt otherwise."""
        return self.resolve_scored(prompt)[0]

    def resolve_scored(self, prompt: str) -> tuple[str, float]:
        """(resolved, confidence).  Confidence is the winning cosine
        (1.0 for canonical/verbatim pool hits, 0.0 for passthrough).

        Scores the full phrase AND its content words (articles/
        adjectives dilute byte-level similarity: "a giant foe" scores
        0.48 whole-phrase but "foe" is in-lexicon), and requires the
        best concept to beat the runner-up by ``margin`` — without it,
        scene nouns like "castle wall" false-positive near the hostile
        cluster at ~0.6 cosine."""
        if prompt in self._canonical:
            return prompt, 1.0
        if prompt not in self._cache:
            self._cache[prompt] = self._resolve_uncached(prompt)
        return self._cache[prompt]

    def resolve_set(self, prompts: Sequence[str]) -> list[str]:
        """Resolve a SET of prompts injectively: a caller asking for N
        distinct concepts must get N distinct text embeddings, so when
        two prompts resolve to the same canonical only the most
        confident keeps it and the rest pass through raw (e.g. the
        compositional "a giant foe" [boss probe — "giant" is excluded
        from every training pool] would otherwise collapse onto
        "a villain"'s enemy slot via its "foe" head noun)."""
        scored = [self.resolve_scored(p) for p in prompts]
        winner: dict[str, int] = {}
        for i, ((res, conf), raw) in enumerate(zip(scored, prompts)):
            if res == raw:
                continue
            if res in prompts:          # canonical asked for verbatim
                continue
            if res not in winner or conf > scored[winner[res]][1]:
                winner[res] = i
        return [res if (res == raw or winner.get(res) == i) else raw
                for i, ((res, _), raw) in enumerate(zip(scored, prompts))]

    def _resolve_uncached(self, prompt: str) -> tuple[str, float]:
        lowered = prompt.lower().strip()
        if lowered in self._exact:                 # verbatim pool entry
            return self._exact[lowered], 1.0
        words = [w for w in lowered.split()
                 if w not in self._STOPWORDS and len(w) >= 3]
        cands = list(dict.fromkeys([prompt, *words]))
        q = np.array(self._embedder.encode(cands), np.float32)
        q /= np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
        sims = q @ self._emb.T                     # [cands, pool]
        # single words get the STRICTER threshold: the byte space puts
        # arbitrary unknown nouns at ~0.7 of some cluster ("castle"
        # 0.76 enemy), while genuine lexicon words score ~1.0
        thresholds = [self.threshold] + [self.word_threshold] * len(words)
        per_concept: dict[str, float] = {}
        for i, thresh in enumerate(thresholds[: len(cands)]):
            for j, owner in enumerate(self._owners):
                s = float(sims[i, j])
                if s >= thresh:
                    per_concept[owner] = max(
                        per_concept.get(owner, -1.0), s)
        if not per_concept:
            return prompt, 0.0
        ranked = sorted(per_concept.items(), key=lambda kv: -kv[1])
        best_c, best_s = ranked[0]
        # margin over the runner-up measured WITHOUT thresholds (a
        # sub-threshold second concept still signals ambiguity)
        others = [float(sims[:, j].max())
                  for j, o in enumerate(self._owners) if o != best_c]
        if others and best_s - max(others) < self.margin:
            return prompt, 0.0
        return best_c, best_s


class OpenVocabSamBackend:
    """SAM point-grid proposals + SigLIP text scoring."""

    def __init__(
        self,
        sam_config,
        sam_params,
        vision_backend,            # JaxSigLIPBackend-compatible callable
        text_tower,
        text_params,
        tokenize,                  # texts -> int ids [N, max_position]
        grid: int = 4,
        iou_threshold: float = 0.7,  # proposal dedupe (mask NMS)
        score_threshold: float = 0.1,
        max_proposals: int = 16,
        propose_fn=None,           # frames -> (masks [B,P,h,w], scores [B,P])
        region_resolution: Optional[int] = None,
        prompt_templates: Optional[Sequence[str]] = None,
        prompt_resolver: Optional["LexiconPromptResolver"] = None,
    ):
        import jax
        import jax.numpy as jnp

        self.sam_config = sam_config
        self.sam_params = sam_params
        self.vision_backend = vision_backend
        self.text_tower = text_tower
        self.text_params = text_params
        self._tokenize = tokenize
        self.grid = grid
        self.iou_threshold = iou_threshold
        self.score_threshold = score_threshold
        self.max_proposals = max_proposals
        # CLIP-style prompt ensembling: each caller prompt is embedded
        # under every template and the normalized embeddings averaged —
        # smooths out phrasing the text tower never saw verbatim
        self.prompt_templates = (tuple(prompt_templates)
                                 if prompt_templates else None)
        self.prompt_resolver = prompt_resolver
        self._text_cache: dict[tuple[str, ...], np.ndarray] = {}

        from gvl_tpu.perception.semantic import NaFlexConfig, RegionExtractor

        self._naflex = NaFlexConfig()
        if region_resolution:
            self._naflex.region_resolution = region_resolution
        self._extractor = RegionExtractor(self._naflex)

        if propose_fn is not None:
            self._proposals = propose_fn
        else:
            from gvl_tpu.models.sam_vit import sam_predict

            size = sam_config.image_size
            step = size / grid
            pts = np.stack(np.meshgrid(
                (np.arange(grid) + 0.5) * step,
                (np.arange(grid) + 0.5) * step,
                indexing="xy"), -1).reshape(-1, 1, 2).astype(np.float32)
            self._points = pts                   # [G², 1, 2]

            mean = jnp.asarray(SAM_MEAN)
            std = jnp.asarray(SAM_STD)

            def propose(params, pixels_u8, points, labels):
                pixels = (pixels_u8.astype(jnp.float32) - mean) / std
                masks, iou = sam_predict(params, pixels, sam_config,
                                         input_points=points,
                                         input_labels=labels,
                                         multimask_output=True)
                # best of the 3 multimask outputs per point
                best = jnp.argmax(iou, axis=-1)
                take = jax.nn.one_hot(best, masks.shape[2],
                                      dtype=masks.dtype)
                mask = jnp.einsum("bpmhw,bpm->bphw", masks, take)
                return mask > 0.0, jnp.max(iou, axis=-1)

            self._propose = jax.jit(propose)
            self._proposals = self._sam_proposals

        def embed_text(params, ids):
            out = text_tower.apply(params, ids)["pooled"]
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)

        self._embed_text = jax.jit(embed_text)

    def _sam_proposals(self, frames):
        """Point-grid SAM proposals → (masks [B,P,h',w'], scores [B,P])."""
        import jax.numpy as jnp

        from gvl_tpu.runtime.native import resize_image

        size = self.sam_config.image_size
        batch = np.stack([
            resize_image(np.ascontiguousarray(f), size, size)
            for f in frames
        ]).astype(np.uint8)
        n_pts = self._points.shape[0]
        points = np.broadcast_to(
            self._points[None], (len(frames), n_pts, 1, 2)).copy()
        labels = np.ones((len(frames), n_pts, 1), np.int32)
        masks, iou = self._propose(
            self.sam_params, jnp.asarray(batch), jnp.asarray(points),
            jnp.asarray(labels))
        masks = np.asarray(masks)
        iou = np.asarray(iou)
        if iou.ndim == 3:
            iou = iou[..., 0]
        return masks, iou

    # ------------------------------------------------------------ loading

    @classmethod
    def from_checkpoints(
        cls,
        sam_dir: str,
        siglip_vision_dir: str,
        siglip_text_dir: Optional[str] = None,
        **kw,
    ) -> "OpenVocabSamBackend":
        """Build from local HF checkpoint directories."""
        from transformers import AutoTokenizer

        from gvl_tpu.models.sam_vit import load_hf_sam
        from gvl_tpu.models.siglip import load_hf_siglip, load_hf_siglip_text
        from gvl_tpu.perception.semantic import JaxSigLIPBackend, NaFlexConfig

        sam_config, sam_params = load_hf_sam(sam_dir)
        tower, vision_vars = load_hf_siglip(siglip_vision_dir)
        # SigLIP's image-text contrastive space is defined by the MAP
        # (attention-pooled) head output, not mean-pooled vision tokens —
        # concept scores against the text tower must use 'cls' pooling
        # regardless of the NaFlexConfig default used for region features.
        nc = NaFlexConfig(pool_strategy="cls")
        vision_backend = JaxSigLIPBackend(
            tower, vision_vars, nc.dtype, image_mean=nc.image_mean,
            image_std=nc.image_std, pool_strategy=nc.pool_strategy)
        text_tower, text_vars = load_hf_siglip_text(
            siglip_text_dir or siglip_vision_dir)
        tokenizer = AutoTokenizer.from_pretrained(
            siglip_text_dir or siglip_vision_dir)

        def tokenize(texts):
            return tokenizer(list(texts), padding="max_length",
                             truncation=True,
                             max_length=text_tower.config.max_position,
                             return_tensors="np")["input_ids"]

        return cls(sam_config, sam_params, vision_backend, text_tower,
                   text_vars, tokenize, **kw)

    @classmethod
    def from_trained_checkpoints(
        cls,
        segmenter_checkpoint: str,
        minisiglip_dir: str,
        proposal_concepts: Optional[Sequence[str]] = None,
        retriever_dir: Optional[str] = "auto",
        **kw,
    ) -> "OpenVocabSamBackend":
        """Fully offline open-vocab composite from self-trained weights.

        Proposals come from the trained
        :class:`~gvl_tpu.models.sam.PromptableSegmenter` prompted with
        its training concepts (class-agnostic after cross-concept mask
        NMS); naming is open-vocabulary — every proposal is scored
        against the CALLER's text prompts in the mini-SigLIP image-text
        space (:mod:`gvl_tpu.training.siglip_train`).  The offline rung
        of the ladder :meth:`from_checkpoints` tops with real SAM +
        SigLIP weights (reference capability:
        `/root/reference/src/perception/sam_concept_segmenter.py:289-361`).
        """
        from gvl_tpu.models.siglip import SigLIPVisionTower
        from gvl_tpu.perception.segmenter import (
            SAMConfig as SegSAMConfig,
            create_sam_segmenter,
        )
        from gvl_tpu.perception.semantic import JaxSigLIPBackend, NaFlexConfig
        from gvl_tpu.training.siglip_train import (
            byte_tokenize,
            load_minisiglip,
        )

        model, variables, vision_cfg, text_cfg = load_minisiglip(
            minisiglip_dir)
        nc = NaFlexConfig(pool_strategy="cls")
        vision_backend = JaxSigLIPBackend(
            SigLIPVisionTower(vision_cfg),
            {"params": variables["params"]["vision"]}, nc.dtype,
            image_mean=nc.image_mean, image_std=nc.image_std,
            pool_strategy="cls")
        text_params = {"params": variables["params"]["text"]}

        seg = create_sam_segmenter(SegSAMConfig(), use_model=True,
                                   checkpoint=segmenter_checkpoint)
        seg_backend = seg.backend
        if proposal_concepts is None:
            from gvl_tpu.training.segmenter_train import CONCEPTS

            proposal_concepts = CONCEPTS
        proposal_concepts = list(proposal_concepts)

        def propose(frames):
            out, n_real = seg_backend.submit(frames, proposal_concepts)
            masks = np.asarray(out["mask"], bool)[:n_real]
            scores = np.asarray(out["scores"], np.float32)[:n_real]
            b, c, q = scores.shape
            return (masks.reshape(b, c * q, *masks.shape[3:]),
                    scores.reshape(b, c * q))

        def tokenize(texts):
            return byte_tokenize(list(texts), text_cfg.max_position)

        from gvl_tpu.models.siglip import SigLIPTextTower

        kw.setdefault("prompt_templates", TRAINED_PROMPT_TEMPLATES)
        if retriever_dir == "auto":
            # the lexicon resolver rides the shipped trained retriever
            # next to the segmenter checkpoint (a sibling outputs/ dir);
            # absent → raw-tower prompts, same as before
            cand = Path(segmenter_checkpoint).resolve().parent / "retriever"
            retriever_dir = str(cand) if (
                cand / "retriever_config.json").exists() else None
        if retriever_dir and "prompt_resolver" not in kw:
            kw["prompt_resolver"] = LexiconPromptResolver.from_trained(
                retriever_dir)
        return cls(None, None, vision_backend,
                   SigLIPTextTower(text_cfg), text_params, tokenize,
                   propose_fn=propose,
                   region_resolution=vision_cfg.image_size, **kw)

    # ----------------------------------------------------------- internals

    def _concept_embeddings(self, concepts: Sequence[str]) -> np.ndarray:
        import jax.numpy as jnp

        key = tuple(concepts)
        if key not in self._text_cache:
            if self.prompt_resolver is not None:
                # lexicon resolution BEFORE templating: unseen phrasings
                # inside the retrieval embedder's semantic reach score
                # as their canonical concept — injectively over the set,
                # so distinct prompts never collapse onto one embedding
                # (cache stays keyed on the caller's raw prompts)
                concepts = self.prompt_resolver.resolve_set(list(concepts))
            if self.prompt_templates:
                # embed every concept under every template, average the
                # normalized embeddings per concept, renormalize
                texts = [t.format(c) for c in concepts
                         for t in self.prompt_templates]
                ids = np.asarray(self._tokenize(texts), np.int32)
                emb = np.asarray(
                    self._embed_text(self.text_params, jnp.asarray(ids)))
                emb = emb.reshape(len(concepts),
                                  len(self.prompt_templates), -1).mean(1)
                emb /= np.maximum(
                    np.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)
                self._text_cache[key] = emb
            else:
                ids = np.asarray(self._tokenize(list(concepts)), np.int32)
                self._text_cache[key] = np.asarray(
                    self._embed_text(self.text_params, jnp.asarray(ids)))
        return self._text_cache[key]

    def _nms(self, masks: np.ndarray, scores: np.ndarray):
        """Score-ordered mask NMS → kept indices."""
        order = np.argsort(-scores)
        kept: list[int] = []
        for idx in order:
            m = masks[idx]
            if not m.any():
                continue
            dup = any(
                (m & masks[j]).sum() / max((m | masks[j]).sum(), 1)
                > self.iou_threshold
                for j in kept
            )
            if not dup:
                kept.append(int(idx))
            if len(kept) >= self.max_proposals:
                break
        return kept

    # ------------------------------------------------------------ protocol

    def __call__(self, frames, concepts, frame_indices):
        from gvl_tpu.runtime.native import resize_mask

        prop_masks, prop_iou = self._proposals(frames)
        prop_masks = np.asarray(prop_masks)     # [B, P, h', w'] bool
        prop_iou = np.asarray(prop_iou)         # [B, P]

        text_emb = self._concept_embeddings(concepts)   # [C, D]

        results = []
        for fi, frame in enumerate(frames):
            h, w = frame.shape[:2]
            kept = self._nms(prop_masks[fi], prop_iou[fi])
            regions, full_masks = [], []
            for j in kept:
                small = prop_masks[fi, j]
                mask = resize_mask(small, h, w)
                ys, xs = np.where(mask)
                if len(xs) == 0:
                    continue
                crop = frame[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
                regions.append(crop)
                full_masks.append((mask, float(prop_iou[fi, j]),
                                   (float(xs.min()), float(ys.min()),
                                    float(xs.max()), float(ys.max()))))
            per_frame = [[] for _ in concepts]
            if regions:
                res = self._naflex.region_resolution
                prepared = [self._extractor.prepare(r, res)[0]
                            for r in regions]
                n = len(prepared)
                # bucket-pad so the jitted tower compiles once per bucket
                # (not once per distinct proposal count)
                bucket = next((b for b in (1, 4, 8, self.max_proposals)
                               if n <= b), n)
                prepared += [np.zeros_like(prepared[0])] * (bucket - n)
                _, pooled = self.vision_backend(np.stack(prepared))
                pooled = pooled[:n]
                emb = pooled / np.maximum(
                    np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)
                scores = emb @ text_emb.T               # [R, C]
                for r, (mask, iou, bbox) in enumerate(full_masks):
                    ci = int(np.argmax(scores[r]))
                    if scores[r, ci] < self.score_threshold:
                        continue
                    per_frame[ci].append({"mask": SegmentationMask(
                        mask=mask,
                        confidence=float(scores[r, ci]),
                        bbox=BoundingBox(*bbox),
                        area_pixels=int(mask.sum()),
                    )})
            results.append(per_frame)
        return results


def create_open_vocab_segmenter(
    sam_dir: str,
    siglip_vision_dir: str,
    siglip_text_dir: Optional[str] = None,
    config=None,
    **kw,
):
    """SAMConceptSegmenter (tracking included) over the composite."""
    from gvl_tpu.perception.segmenter import SAMConceptSegmenter, SAMConfig

    backend = OpenVocabSamBackend.from_checkpoints(
        sam_dir, siglip_vision_dir, siglip_text_dir, **kw)
    return SAMConceptSegmenter(config or SAMConfig(), backend=backend)


def create_trained_open_vocab_segmenter(
    segmenter_checkpoint: str,
    minisiglip_dir: str,
    config=None,
    **kw,
):
    """SAMConceptSegmenter over the self-trained composite (offline)."""
    from gvl_tpu.perception.segmenter import SAMConceptSegmenter, SAMConfig

    backend = OpenVocabSamBackend.from_trained_checkpoints(
        segmenter_checkpoint, minisiglip_dir, **kw)
    return SAMConceptSegmenter(config or SAMConfig(), backend=backend)
