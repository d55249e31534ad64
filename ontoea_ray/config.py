"""Typed pipeline configuration + stage registry — the engine's
user-extension surface.

Mirrors the reference's config-driven switch points (SURVEY.md §2.12): CCM
version, loss variant, neg-sampling strategies, fusion way, metric, init
scheme — as enum-ish dataclass fields instead of a JSON attr-bag
(/root/reference/code/src/openea/modules/args/args_hander.py), and the
ModelFamily-style registry (/root/reference/code/run/main_from_args.py:15-21)
as a name -> stage-constructor mapping where every stage is a function
``Dataset -> Dataset`` (composable with ``build_pipeline``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import ray.data

from ontoea_ray.pipelines.training import OntoEAConfig


@dataclass
class PipelineConfig:
    """End-to-end engine configuration (defaults = shipped reference config
    ontoea_args_15K.json where a switch exists there)."""

    # ontology kernel
    ccm_version: int = 4              # 0..5 -> check_type_v1..v6 (shipped: 4 -> v5)
    unsure_w: float = 0.0
    smoothing_k: float = 0.0
    decay_weight: float = 1.0
    miss_completion: bool = False
    # evaluation
    eval_metric: str = "inner"        # inner | cosine | euclidean | manhattan
    eval_norm: bool = True
    csls_k: int = 10
    top_k: tuple[int, ...] = (1, 5, 10, 50)
    type_weight: float = 1.0          # gamma
    enum_weight: bool = False
    stable_cut: int = 100
    # linking / flagship
    linker_type_weight: float = 0.2
    scan_batch_size: int = 2048
    num_edge_buckets: int = 16
    # training
    trainer: OntoEAConfig = field(default_factory=OntoEAConfig)
    seed: int = 42


# ---------------------------------------------------------------------------
# stage registry
# ---------------------------------------------------------------------------

StageFn = Callable[[ray.data.Dataset], ray.data.Dataset]
STAGES: dict[str, Callable[..., StageFn]] = {}


def register_stage(name: str):
    def deco(factory):
        STAGES[name] = factory
        return factory

    return deco


@register_stage("extract_text")
def _extract_factory(cfg: PipelineConfig) -> StageFn:
    from ontoea_ray.stages.extract import extract_text_stage

    return extract_text_stage


@register_stage("scan_link")
def _scan_link_factory(cfg: PipelineConfig, state_ref=None) -> StageFn:
    from ontoea_ray.stages.scan_link import scan_and_link_stage

    def fn(ds):
        return scan_and_link_stage(ds, state_ref, batch_size=cfg.scan_batch_size)

    return fn


@register_stage("dedup_partials")
def _dedup_partials_factory(cfg: PipelineConfig) -> StageFn:
    from ontoea_ray.stages.canonicalize import dedup_partials_stage

    return dedup_partials_stage


@register_stage("dedup_merge")
def _dedup_merge_factory(cfg: PipelineConfig) -> StageFn:
    from ontoea_ray.stages.canonicalize import dedup_merge

    return dedup_merge


@register_stage("exact_dedup")
def _exact_dedup_factory(cfg: PipelineConfig, **kw) -> StageFn:
    from ontoea_ray.stages.dedup import exact_dedup

    return lambda ds: exact_dedup(ds, **kw)


@register_stage("minhash_lsh")
def _lsh_factory(cfg: PipelineConfig, **kw) -> StageFn:
    from ontoea_ray.stages.dedup import lsh_candidate_pairs

    return lambda ds: lsh_candidate_pairs(ds, **kw)


@register_stage("simhash")
def _simhash_factory(cfg: PipelineConfig, **kw) -> StageFn:
    from ontoea_ray.stages.dedup import simhash64

    return lambda ds: simhash64(ds, **kw)


@register_stage("langid")
def _langid_factory(cfg: PipelineConfig) -> StageFn:
    from ontoea_ray.functions.text import predict_lang

    def fn(ds):
        return ds.map_batches(
            lambda b: b.append_column("pred_lang", predict_lang(b["text"])),
            batch_format="pyarrow",
        )

    return fn


def build_pipeline(cfg: PipelineConfig, stage_names: list[str], **stage_kwargs) -> StageFn:
    """Compose registered stages into one Dataset -> Dataset function."""
    fns = [STAGES[n](cfg, **stage_kwargs.get(n, {})) for n in stage_names]

    def run(ds: ray.data.Dataset) -> ray.data.Dataset:
        for f in fns:
            ds = f(ds)
        return ds

    return run
