"""ann-benchmarks adapter protocol: fit/query/batch_query recall vs exact GT
(the reference's canonical evaluation harness, SURVEY §4)."""

import numpy as np
import pytest

from ngt_tpu.annb import ANNG, ONNG, PANNG, QG, _resolve_metric


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(2000, 32)).astype(np.float32)
    Q = X[:64] + rng.normal(scale=0.05, size=(64, 32)).astype(np.float32)
    # exact GT by brute force
    d = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10]
    return X, Q, gt


def _recall(res, gt):
    hits = sum(
        len(set(map(int, r[:10])) & set(map(int, g))) for r, g in zip(res, gt)
    )
    return hits / (len(gt) * 10)


def test_metric_mapping():
    assert _resolve_metric("euclidean") == "L2"
    assert _resolve_metric("angular") == "Cosine"
    with pytest.raises(ValueError):
        _resolve_metric("mahalanobis")


@pytest.mark.parametrize("cls", [ANNG, PANNG, ONNG, QG])
def test_adapter_recall(corpus, cls):
    X, Q, gt = corpus
    algo = cls("euclidean")
    algo.fit(X)
    algo.set_query_arguments(0.1)
    # single-query path: zero-based indices into X, self-hit found
    ids = algo.query(X[123], 10)
    assert 123 in set(map(int, ids))
    # batch path
    algo.batch_query(Q, 10)
    res = algo.get_batch_results()
    assert len(res) == len(Q)
    assert _recall(res, gt) >= 0.9
    assert algo.get_memory_usage() > 0
    assert "ngt_tpu" in str(algo)
    algo.done()
