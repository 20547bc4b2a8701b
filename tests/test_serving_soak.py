"""Short soak of the HTTP serving front-end under mixed /query + /add +
/remove load — the CI-sized version of tools/serving_soak.py (which runs
60+ s and writes benchmarks/serving_soak.json). Asserts the same
contract: no errors, no hung clients, stable-id discipline (queries
never return ids removed before they started), bounded latency tail,
bounded RSS growth."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_http_soak_short(tmp_path, mesh8):
    from serving_soak import build_server, run_soak

    base, server = build_server(str(tmp_path), n_dev=len(__import__("jax").devices()))
    try:
        res = run_soak(base, seconds=6.0, n_clients=4, mutate=True, server=server)
    finally:
        server.shutdown()
    assert res["counts"]["query"] > 0
    assert res["counts"]["add"] > 0
    # contract assertions live inside run_soak; reaching here means the
    # soak held — record the shape of the result for regression
    assert "query" in res["latency_s"]
    assert res["programs"]["after_warmup"] > 0


def test_http_soak_adaptive_early_stop(tmp_path, mesh8):
    """The flagship serving path — adaptive + per-query escalation +
    dynamic corpus — under the same mixed churn (VERDICT r4 item 6).
    run_soak's server hook additionally asserts that corpus edits never
    recompile non-escalation programs mid-soak."""
    from serving_soak import build_server, run_soak

    base, server = build_server(
        str(tmp_path), n_dev=len(__import__("jax").devices()), mode="adaptive"
    )
    try:
        res = run_soak(base, seconds=6.0, n_clients=4, mutate=True, server=server)
    finally:
        server.shutdown()
    assert res["counts"]["query"] > 0
    assert res["counts"]["add"] > 0
    assert res["programs"]["after_warmup"] > 0
