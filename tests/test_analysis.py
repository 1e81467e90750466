"""FLOPs/params analysis tests (reference semantics: EE/analysis.py)."""

import jax
import numpy as np
import pytest

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.evaluation.analysis import Analysis, calc_flops
from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1, 2)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    return cfg, params, Analysis(params, cfg, seq=64)


def test_everyone_exits_last_means_full_cost(setup):
    cfg, params, analysis = setup
    E = cfg.num_exits
    dist = {i: 0.0 for i in range(E)}
    dist[E] = 1.0
    full_p, used_p, full_f, used_f, full_l, used_l = (
        analysis.exit_to_params_and_flops(dist)
    )
    assert used_p == pytest.approx(full_p)
    assert used_f == pytest.approx(full_f)
    assert used_l == pytest.approx(1.0)


def test_early_exits_reduce_cost_monotonically(setup):
    cfg, params, analysis = setup
    E = cfg.num_exits
    costs = []
    for j in range(E + 1):
        dist = {i: 0.0 for i in range(E + 1)}
        dist[j] = 1.0
        _, used_p, _, used_f, _, used_l = analysis.exit_to_params_and_flops(dist)
        costs.append((used_p, used_f, used_l))
    flops = [c[1] for c in costs]
    lats = [c[2] for c in costs]
    # latency proxy is exit-index-based: strictly increasing by construction
    assert lats == sorted(lats)
    # embedding exits are all cheaper than any encoder exit (vision_avg may
    # cost more than text_avg — the patch matmul — so no order within them)
    n_emb = 2
    assert max(flops[:n_emb]) < min(flops[n_emb:])
    # encoder exits increase with layer depth; final classifier is costliest
    assert flops[n_emb:] == sorted(flops[n_emb:])
    # deepest exit (at the last encoder layer here) <= final classifier path
    assert flops[-2] <= flops[-1]


def test_calc_flops_keys(setup):
    cfg, params, analysis = setup
    E = cfg.num_exits
    dist = {i: 1.0 / (E + 1) for i in range(E + 1)}
    log = calc_flops(dist, analysis, {"exit_threshold": 0.5, "epsilon": 0.1})
    for key in ("#Params(M) used", "#Params(M) total", "#GFLOPs used",
                "#GFLOPs total", "GFLOPs reduction", "Params reduction",
                "Latency reduction", "exit_distribution"):
        assert key in log
    assert 0 < log["GFLOPs reduction"] < 1
    assert 0 < log["Latency reduction"] < 1


def test_subgraph_flops_scale_with_layer_depth(setup):
    cfg, params, analysis = setup
    # encoder exit at layer 2 costs about twice layer 1's encoder share
    f = analysis.subgraph_flops
    order = analysis.order
    l1 = f[order.index(1)]
    l2 = f[order.index(2)]
    assert l2 > l1
