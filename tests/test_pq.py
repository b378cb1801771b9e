"""Product quantization (operators/pq.py): encode/ADC semantics vs a numpy
mirror, recall against exact search, determinism, validation."""

from __future__ import annotations

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators import pq as PQ


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )


def _numpy_adc_topk(X, model, q, k):
    m, sub = model["m"], model["sub"]
    codes = []
    for j in range(m):
        C = np.asarray(model["codebooks"][j])
        Xj = X[:, j * sub : (j + 1) * sub]
        d = (C * C).sum(1)[None, :] - 2.0 * Xj @ C.T
        codes.append(np.argmin(d, axis=1))
    lut = PQ._adc_lut(model, list(q))
    est = np.zeros(len(X))
    for j in range(m):
        est += np.asarray(lut[j])[codes[j]]
    order = sorted(range(len(X)), key=lambda i: (round(est[i], 6), i))
    return order[:k], est


def test_encode_and_adc_match_numpy_mirror(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (120, 16))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    q = X[0]
    want_ids, want_est = _numpy_adc_topk(X, model, q, 10)
    got = PQ.pq_topk(
        PQ.pq_encode(df, model), model, list(q), 10
    ).collect()
    assert [r["vec_id"] for r in got] == want_ids
    for r in got:
        assert r["adc_dist"] == pytest.approx(round(want_est[r["vec_id"]], 6), abs=1e-9)


def test_adc_recall_against_exact(spark):
    # PQ with a decent budget must put most of the true top-10 in its
    # ADC top-10 on smooth data (clustered gaussians: quantization-friendly)
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 5, (6, 32))
    X = np.vstack([c + rng.normal(0, 0.5, (50, 32)) for c in centers])
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=32, m=4, k=16, iterations=3)
    enc = PQ.pq_encode(df, model)
    q = X[7]
    exact = set(np.argsort(((X - q) ** 2).sum(1), kind="stable")[:10].tolist())
    got = {r["vec_id"] for r in PQ.pq_topk(enc, model, list(q), 10).collect()}
    recall = len(exact & got) / 10
    assert recall >= 0.6, f"ADC recall@10 = {recall}"


def test_fused_fit_bit_equals_sequential_kmeans(spark):
    """pq_fit's fused multi-subspace loop must produce codebooks BIT-EQUAL
    to m sequential kmeans_lloyd runs over F.slice projections (the
    pre-r13 implementation) — this is what keeps every PQ full-replay
    oracle valid after the fusion."""
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.kmeans import kmeans_lloyd

    rng = np.random.default_rng(11)
    X = rng.normal(size=(80, 16))
    df = _emb_df(spark, X)
    m, k, iters, sub = 4, 5, 2, 4
    fused = PQ.pq_fit(df, dim=16, m=m, k=k, iterations=iters)
    for j in range(m):
        sliced = df.select(
            "vec_id", F.slice(F.col("embedding"), j * sub + 1, sub).alias("_subv")
        )
        seq = kmeans_lloyd(sliced, "_subv", "vec_id", k=k, iterations=iters)
        assert fused["codebooks"][j] == seq, f"subspace {j}"


def test_deterministic_and_partition_invariant(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (60, 8))
    df = _emb_df(spark, X)
    m1 = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=2)
    m2 = PQ.pq_fit(df.repartition(7), vec_col="embedding", dim=8, m=2, k=4, iterations=2)
    assert m1["codebooks"] == m2["codebooks"]
    a = PQ.pq_topk(PQ.pq_encode(df, m1), m1, list(X[3]), 5).collect()
    b = PQ.pq_topk(PQ.pq_encode(df.repartition(5), m2), m2, list(X[3]), 5).collect()
    assert a == b


def test_validation(spark):
    df = _emb_df(spark, np.zeros((5, 10)))
    with pytest.raises(ValueError, match="divisible"):
        PQ.pq_fit(df, vec_col="embedding", dim=10, m=4, k=2)


def test_rescored_topk_exact_on_candidates(spark):
    # with candidates == n, the rescored top-k IS the exact L2 top-k
    rng = np.random.default_rng(19)
    X = rng.normal(0, 2, (80, 16))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    enc = PQ.pq_encode(df, model)
    q = X[5]
    got = [
        r["vec_id"]
        for r in PQ.pq_rescored_topk(enc, model, list(q), 10, candidates=80).collect()
    ]
    d = ((X - q) ** 2).sum(1)
    want = sorted(range(len(X)), key=lambda i: (round(d[i], 6), i))[:10]
    assert got == want
    # and the production setting (candidates=30) beats raw ADC recall
    exact10 = set(want)
    resc = {
        r["vec_id"]
        for r in PQ.pq_rescored_topk(enc, model, list(q), 10, candidates=30).collect()
    }
    adc = {r["vec_id"] for r in PQ.pq_topk(enc, model, list(q), 10).collect()}
    assert len(exact10 & resc) >= len(exact10 & adc)


def test_ivf_pq_rescored_recall_vs_plain_pq(spark):
    """The composed IVF+PQ path at equal candidate budget must not lose
    recall vs the unpruned PQ path: the coarse probe concentrates the
    candidate budget on cells near the query, so on clustered data the
    in-cell ADC shortlist is at least as good as the global one."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(23)
    centers = rng.normal(0, 5, (6, 32))
    X = np.vstack([c + rng.normal(0, 0.5, (40, 32)) for c in centers])
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=32, m=4, k=16, iterations=3)
    cents = S.ivf_train_centroids(df, n_centroids=6, sample_fraction=1.0, seed=1)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    q = X[11]
    d = ((X - q) ** 2).sum(1)
    exact10 = set(np.argsort(d, kind="stable")[:10].tolist())
    plain = {
        r["vec_id"]
        for r in PQ.pq_rescored_topk(enc, model, list(q), 10, candidates=25).collect()
    }
    composed = {
        r["vec_id"]
        for r in PQ.ivf_pq_rescored_topk(
            enc, cents, model, list(q), 10, nprobe=2, candidates=25
        ).collect()
    }
    assert len(exact10 & composed) >= len(exact10 & plain)
    assert len(exact10 & composed) >= 8


def test_ivf_pq_probes_only_in_cell_rows(spark):
    """Rows outside the probed cells can never appear, even if they are the
    true nearest — pins that the pruning actually prunes."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(29)
    X = rng.normal(0, 1, (60, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=2)
    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    q = X[0]
    cells = S.ivf_probe_cells(cents, list(q), 1)
    in_cell = {
        r["vec_id"] for r in enc.filter(enc.ivf_cell.isin(cells)).collect()
    }
    got = {
        r["vec_id"]
        for r in PQ.ivf_pq_rescored_topk(
            enc, cents, model, list(q), 10, nprobe=1, candidates=60
        ).collect()
    }
    assert got <= in_cell


def test_pq_encode_rejects_preexisting_ivf_cell(spark):
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(31)
    X = rng.normal(0, 1, (10, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    assigned = S.ivf_assign(df, S.seeded_centroids(8, 4, seed=7, scale=1.0))
    with pytest.raises(ValueError, match="ivf_cell"):
        PQ.pq_encode(assigned, model)


# ---------------------------------------------------------------------------
# Residual IVFADC
# ---------------------------------------------------------------------------
def _residual_enc(df, cents, dim, m, k, iters):
    from fs2_kinesis_firehose_spark.operators import similarity as S

    assigned = S.ivf_assign(df, cents)
    with_res = PQ.ivf_residual(assigned, cents)
    model = PQ.pq_fit(
        with_res, vec_col="residual", dim=dim, m=m, k=k, iterations=iters
    )
    enc = (
        PQ.pq_encode(
            with_res.withColumnRenamed("ivf_cell", "_coarse"),
            model,
            vec_col="residual",
        )
        .withColumnRenamed("_coarse", "ivf_cell")
    )
    return enc, model


def test_ivf_residual_matches_numpy(spark):
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(41)
    X = rng.normal(0, 2, (50, 8))
    df = _emb_df(spark, X)
    cents = S.ivf_train_centroids(df, n_centroids=4, sample_fraction=1.0, seed=1)
    got = PQ.ivf_residual(S.ivf_assign(df, cents), cents).collect()
    C = np.asarray(cents)
    for r in got:
        want = X[r["vec_id"]] - C[r["ivf_cell"]]
        assert np.allclose(r["residual"], want, atol=0)


def test_residual_ivfadc_exact_at_full_budget(spark):
    """nprobe = all cells + candidates = n: the residual path degenerates to
    an exact search (rescore sees every row), regardless of code quality —
    and the cross-cell ``‖q − c‖²`` constant must not corrupt the pool."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(43)
    X = rng.normal(0, 1, (80, 16))
    df = _emb_df(spark, X)
    cents = S.ivf_train_centroids(df, n_centroids=4, sample_fraction=1.0, seed=2)
    enc, model = _residual_enc(df, cents, 16, 4, 8, 2)
    q = X[3]
    exact = np.argsort(((X - q) ** 2).sum(1), kind="stable")[:10].tolist()
    got = [
        r["vec_id"]
        for r in PQ.ivf_pq_residual_rescored_topk(
            enc, cents, model, list(q), 10, nprobe=4, candidates=80
        ).collect()
    ]
    assert got == exact


def test_residual_ivfadc_recall_not_below_raw_composition(spark):
    """The reason residuals exist: at equal (m, k, nprobe, candidates)
    budget on clustered data, residual codes must not lose recall vs the
    raw-vector composition (the codebooks model a tighter distribution)."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(47)
    centers = rng.normal(0, 5, (6, 32))
    X = np.vstack([c + rng.normal(0, 0.5, (40, 32)) for c in centers])
    df = _emb_df(spark, X)
    cents = S.ivf_train_centroids(df, n_centroids=6, sample_fraction=1.0, seed=1)

    raw_model = PQ.pq_fit(df, vec_col="embedding", dim=32, m=4, k=16, iterations=3)
    raw_enc = S.ivf_assign(PQ.pq_encode(df, raw_model), cents).cache()
    res_enc, res_model = _residual_enc(df, cents, 32, 4, 16, 3)
    res_enc = res_enc.cache()

    raw_hits = res_hits = 0
    queries = [3, 11, 57, 101, 149, 203]  # one per cluster
    for qi in queries:
        q = X[qi]
        exact10 = set(np.argsort(((X - q) ** 2).sum(1), kind="stable")[:10].tolist())
        raw = {
            r["vec_id"]
            for r in PQ.ivf_pq_rescored_topk(
                raw_enc, cents, raw_model, list(q), 10, nprobe=2, candidates=25
            ).collect()
        }
        res = {
            r["vec_id"]
            for r in PQ.ivf_pq_residual_rescored_topk(
                res_enc, cents, res_model, list(q), 10, nprobe=2, candidates=25
            ).collect()
        }
        raw_hits += len(exact10 & raw)
        res_hits += len(exact10 & res)
    # statistical, not per-query: across a query per cluster the residual
    # codes must match the raw composition overall (and stay near-exact)
    assert res_hits >= raw_hits - 1
    assert res_hits >= 0.85 * 10 * len(queries)


def test_residual_ivfadc_probes_only_in_cell_rows(spark):
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(53)
    X = rng.normal(0, 1, (60, 8))
    df = _emb_df(spark, X)
    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc, model = _residual_enc(df, cents, 8, 2, 4, 2)
    q = X[0]
    cells = S.ivf_probe_cells(cents, list(q), 1)
    in_cell = {r["vec_id"] for r in enc.filter(enc.ivf_cell.isin(cells)).collect()}
    got = {
        r["vec_id"]
        for r in PQ.ivf_pq_residual_rescored_topk(
            enc, cents, model, list(q), 10, nprobe=1, candidates=60
        ).collect()
    }
    assert got <= in_cell


# ---------------------------------------------------------------------------
# Broadcast-LUT scoring (lut_mode="broadcast") — the production-dims path
# ---------------------------------------------------------------------------
def test_bcast_lut_bit_equal_to_literal_plain(spark):
    """The broadcast LUT path must be BIT-identical to the literal chain
    (same left-to-right fold over the same driver-built LUT), so both share
    one full-replay oracle."""
    rng = np.random.default_rng(61)
    X = rng.normal(0, 1, (100, 16))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    enc = PQ.pq_encode(df, model).cache()
    q = list(X[2])
    lit_rows = PQ.pq_topk(enc, model, q, 10).collect()
    bc_rows = PQ.pq_topk(enc, model, q, 10, lut_mode="broadcast").collect()
    assert [tuple(r) for r in lit_rows] == [tuple(r) for r in bc_rows]
    # and through the rescore path
    lit_r = PQ.pq_rescored_topk(enc, model, q, 10, candidates=30).collect()
    bc_r = PQ.pq_rescored_topk(
        enc, model, q, 10, candidates=30, lut_mode="broadcast"
    ).collect()
    assert [tuple(r) for r in lit_r] == [tuple(r) for r in bc_r]


def test_bcast_lut_bit_equal_to_literal_residual(spark):
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(67)
    X = rng.normal(0, 1, (80, 16))
    df = _emb_df(spark, X)
    cents = S.ivf_train_centroids(df, n_centroids=4, sample_fraction=1.0, seed=2)
    enc, model = _residual_enc(df, cents, 16, 4, 8, 2)
    enc = enc.cache()
    q = list(X[9])
    lit_rows = PQ.ivf_pq_residual_rescored_topk(
        enc, cents, model, q, 10, nprobe=2, candidates=30
    ).collect()
    bc_rows = PQ.ivf_pq_residual_rescored_topk(
        enc, cents, model, q, 10, nprobe=2, candidates=30, lut_mode="broadcast"
    ).collect()
    assert [tuple(r) for r in lit_rows] == [tuple(r) for r in bc_rows]


def test_bcast_lut_plan_shape(spark):
    """Plan pins for the broadcast path: the LUT arrives via a
    BroadcastHashJoin (hashed KB-scale build side), the corpus is never
    hash-repartitioned (no shuffle Exchange), and ranking stays
    TakeOrderedAndProject — the zero-shuffle scan plan that survives 100×."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(71)
    X = rng.normal(0, 1, (60, 8))
    df = _emb_df(spark, X)
    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc, model = _residual_enc(df, cents, 8, 2, 4, 2)
    q = list(X[0])
    plan = PQ.ivf_pq_residual_rescored_topk(
        enc, cents, model, q, 5, nprobe=2, candidates=20, lut_mode="broadcast"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan
    # Plain path: Catalyst constant-folds the lit(1) stream-side key, so the
    # equi-join degenerates to a one-row broadcast nested-loop join (the
    # repo's documented 1-row BNLJ idiom — a 1-row build side costs nothing
    # at any scale).  Pin: SOME broadcast join, and still no corpus shuffle.
    model2 = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    plan2 = PQ.pq_topk(
        PQ.pq_encode(df, model2), model2, q, 5, lut_mode="broadcast"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2 or "BroadcastNestedLoopJoin" in plan2
    assert "Exchange hashpartitioning" not in plan2


def test_bcast_lut_mode_validation(spark):
    rng = np.random.default_rng(73)
    X = rng.normal(0, 1, (10, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    enc = PQ.pq_encode(df, model)
    with pytest.raises(ValueError, match="lut_mode"):
        PQ.pq_adc_scores(enc, model, list(X[0]), lut_mode="nope").collect()


def test_bcast_lut_rejects_reserved_columns(spark):
    """Broadcast mode joins in _lutkey/_lut (_lutcell/_cconst on the
    residual path); a pre-existing column of that name would be silently
    clobbered — must raise instead (the pq_encode ivf_cell precedent)."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(79)
    X = rng.normal(0, 1, (10, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    enc = PQ.pq_encode(df, model)
    with pytest.raises(ValueError, match="_lut"):
        PQ.pq_adc_scores(
            enc.withColumn("_lut", F.lit(1)), model, list(X[0]), lut_mode="broadcast"
        )
    from fs2_kinesis_firehose_spark.operators import similarity as S

    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    renc, rmodel = _residual_enc(df, cents, 8, 2, 4, 1)
    with pytest.raises(ValueError, match="_cconst"):
        PQ.ivf_pq_residual_rescored_topk(
            renc.withColumn("_cconst", F.lit(1.0)),
            cents, rmodel, list(X[0]), 5, nprobe=1, lut_mode="broadcast",
        )


def test_bcast_lut_production_dims_bit_equal(spark):
    """The claim the broadcast path exists for: at production-scale
    codebooks (m=32 subspaces × k=256 codes — 8192 LUT doubles, the
    regime where the literal chain carries ~64 KB of plan constants)
    both paths still agree bitwise and the broadcast plan keeps the
    KB-scale LUT out of the generated code.  Codebooks are synthetic
    (scoring never consults the float vectors), so the test is fast."""
    rng = np.random.default_rng(83)
    m, k, sub = 32, 256, 4
    model = {
        "m": m, "k": k, "sub": sub, "dim": m * sub,
        "codebooks": [
            [[float(x) for x in rng.normal(0, 1, sub)] for _ in range(k)]
            for _ in range(m)
        ],
    }
    rows = [(i, [int(c) for c in rng.integers(0, k, m)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, pq_code array<int>").cache()
    q = [float(x) for x in rng.normal(0, 1, m * sub)]
    lit_rows = PQ.pq_adc_scores(df, model, q).orderBy("vec_id").collect()
    bc = PQ.pq_adc_scores(df, model, q, lut_mode="broadcast")
    bc_rows = bc.orderBy("vec_id").collect()
    assert [(r.vec_id, r.adc_dist) for r in lit_rows] == [
        (r.vec_id, r.adc_dist) for r in bc_rows
    ]
    plan = bc._jdf.queryExecution().executedPlan().toString()
    # the LUT rides as data (a broadcast join), not as plan literals
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("-0.") + plan.count("0.") < k  # no k-scale constant spill


# ---------------------------------------------------------------------------
# Persisted index lifecycle (write_pq_index / read_pq_index)
# ---------------------------------------------------------------------------
def test_persisted_index_roundtrips_bit_exact(spark, tmp_path):
    """Build-persist-reload-query: the reloaded model must equal the
    in-session one EXACTLY (parquet DOUBLE roundtrip), and the reloaded
    IVFADC topk must be bit-identical to the in-session topk."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(101)
    X = rng.normal(0, 1, (150, 16))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    cents = S.seeded_centroids(16, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    path = str(tmp_path / "idx")
    PQ.write_pq_index(
        path, model, enc.select("vec_id", "embedding", "pq_code", "ivf_cell"),
        cell_col="ivf_cell", centroids=cents,
    )
    model2, codes2, cents2 = PQ.read_pq_index(spark, path)
    # model roundtrip exact (floats unchanged through parquet DOUBLE)
    assert model2["m"] == model["m"] and model2["k"] == model["k"]
    assert model2["sub"] == model["sub"] and model2["dim"] == model["dim"]
    assert model2["codebooks"] == [
        [[float(x) for x in c] for c in book] for book in model["codebooks"]
    ]
    assert cents2 == [[float(x) for x in c] for c in cents]
    q = list(X[3])
    want = PQ.ivf_pq_rescored_topk(
        enc, cents, model, q, 10, nprobe=2, candidates=40
    ).collect()
    got = PQ.ivf_pq_rescored_topk(
        codes2, cents2, model2, q, 10, nprobe=2, candidates=40
    ).collect()
    assert [(r.vec_id, r.l2_dist) for r in got] == [
        (r.vec_id, r.l2_dist) for r in want
    ]
    # codes roundtrip exact too
    want_codes = {r.vec_id: list(r.pq_code) for r in enc.collect()}
    got_codes = {r.vec_id: list(r.pq_code) for r in codes2.collect()}
    assert got_codes == want_codes


def test_persisted_index_partition_pruning(spark, tmp_path):
    """The inverted-list layout earns its keep: a probe filter over the
    partitionBy(ivf_cell) codes must prune at PLANNING time — the scan's
    PartitionFilters carry the cell predicate and only the probed cells'
    directories are read."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(103)
    X = rng.normal(0, 1, (120, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    path = str(tmp_path / "idx")
    PQ.write_pq_index(
        path, model, enc.select("vec_id", "embedding", "pq_code", "ivf_cell"),
        cell_col="ivf_cell", centroids=cents,
    )
    _, codes2, cents2 = PQ.read_pq_index(spark, path)
    from pyspark.sql import functions as F

    cells = S.ivf_probe_cells(cents2, list(X[0]), 2)
    pool = codes2.filter(F.col("ivf_cell").isin([int(c) for c in cells]))
    plan = pool._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:200]


def test_persisted_index_flat_no_centroids(spark, tmp_path):
    """Flat (non-IVF) index: centroids omitted, reload returns None, and
    the plain PQ query path serves from the reloaded artifacts."""
    rng = np.random.default_rng(107)
    X = rng.normal(0, 1, (80, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    enc = PQ.pq_encode(df, model)
    path = str(tmp_path / "idx")
    PQ.write_pq_index(path, model, enc.select("vec_id", "embedding", "pq_code"))
    model2, codes2, cents2 = PQ.read_pq_index(spark, path)
    assert cents2 is None
    q = list(X[1])
    want = PQ.pq_topk(enc, model, q, 5).collect()
    got = PQ.pq_topk(codes2, model2, q, 5).collect()
    assert [(r.vec_id, r.adc_dist) for r in got] == [
        (r.vec_id, r.adc_dist) for r in want
    ]


def test_write_pq_index_validates_cell_col(spark, tmp_path):
    rng = np.random.default_rng(109)
    X = rng.normal(0, 1, (10, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    enc = PQ.pq_encode(df, model)
    with pytest.raises(ValueError, match="cell_col"):
        PQ.write_pq_index(str(tmp_path / "x"), model, enc, cell_col="nope")


# ---------------------------------------------------------------------------
def test_multi_query_bit_equal_to_single(spark):
    """ivf_pq_rescored_topk_multi must reproduce the single-query path
    bit-for-bit for every query in the set (shared LUT builder, same fold
    order, same round/tie rules) — the whole point of batching the serving
    loop is that it changes the JOB COUNT, never the answers."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(113)
    X = rng.normal(0, 1, (200, 16))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    cents = S.seeded_centroids(16, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    queries = [(int(i), list(X[i])) for i in (0, 7, 42)]
    got = PQ.ivf_pq_rescored_topk_multi(
        enc, cents, model, queries, 10, nprobe=2, candidates=40
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.l2_dist))
    for qid, qv in queries:
        want = [
            (r.vec_id, r.l2_dist)
            for r in PQ.ivf_pq_rescored_topk(
                enc, cents, model, qv, 10, nprobe=2, candidates=40
            ).collect()
        ]
        assert by_q[qid] == want, f"query {qid} diverged from single-query path"


def test_multi_query_constant_jobs(spark):
    """The serving pin for r11 verdict #2: answering a batch of N queries
    must submit the SAME number of Spark jobs as a batch of 1 — one plan
    per batch, not one job per query row."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(127)
    X = rng.normal(0, 1, (150, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents).select(
        "vec_id", "embedding", "pq_code", "ivf_cell"
    )
    enc = enc.cache()
    enc.count()  # materialize so both measured runs see identical lineage

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(queries):
        group = f"multi-{len(queries)}"
        sc.setJobGroup(group, "job-count pin")
        try:
            PQ.ivf_pq_rescored_topk_multi(
                enc, cents, model, queries, 5, nprobe=2, candidates=20
            ).collect()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    one = jobs_for([(0, list(X[0]))])
    three = jobs_for([(int(i), list(X[i])) for i in (1, 2, 3)])
    enc.unpersist()
    assert three == one, f"jobs grew with query count: 1q={one}, 3q={three}"


def test_multi_query_validation(spark):
    rng = np.random.default_rng(131)
    X = rng.normal(0, 1, (20, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    from fs2_kinesis_firehose_spark.operators import similarity as S

    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    with pytest.raises(ValueError, match="non-empty"):
        PQ.ivf_pq_rescored_topk_multi(enc, cents, model, [], 5)
    with pytest.raises(ValueError, match="reserve"):
        PQ.ivf_pq_rescored_topk_multi(
            enc.withColumn("_adc", enc.vec_id), cents, model, [(0, list(X[0]))], 5
        )


# ---------------------------------------------------------------------------
def test_append_index_equals_single_shot(spark, tmp_path):
    """append_pq_index's contract: an index grown by appends is
    BIT-IDENTICAL to one built over the union with the same frozen model —
    codes, cells, layout pruning, and served top-k."""
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(137)
    X = rng.normal(0, 1, (160, 16))
    df = _emb_df(spark, X)
    base = df.filter(F.col("vec_id") % 2 == 0)
    growth = df.filter(F.col("vec_id") % 2 == 1)

    model = PQ.pq_fit(base, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    cents = S.seeded_centroids(16, 4, seed=7, scale=1.0)

    path = str(tmp_path / "idx")
    enc_base = S.ivf_assign(PQ.pq_encode(base, model), cents)
    PQ.write_pq_index(
        path, model, enc_base.select("vec_id", "embedding", "pq_code", "ivf_cell"),
        cell_col="ivf_cell", centroids=cents,
    )
    PQ.append_pq_index(spark, path, growth.select("vec_id", "embedding"))

    model2, codes2, cents2 = PQ.read_pq_index(spark, path)
    # single-shot: encode EVERYTHING with the same frozen (base-fit) model
    enc_all = S.ivf_assign(PQ.pq_encode(df, model), cents)
    want = {
        r.vec_id: (list(r.pq_code), r.ivf_cell) for r in enc_all.collect()
    }
    got = {r.vec_id: (list(r.pq_code), r.ivf_cell) for r in codes2.collect()}
    assert got == want

    q = list(X[5])
    want_topk = PQ.ivf_pq_rescored_topk(
        enc_all, cents, model, q, 10, nprobe=2, candidates=40
    ).collect()
    got_topk = PQ.ivf_pq_rescored_topk(
        codes2, cents2, model2, q, 10, nprobe=2, candidates=40
    ).collect()
    assert [(r.vec_id, r.l2_dist) for r in got_topk] == [
        (r.vec_id, r.l2_dist) for r in want_topk
    ]


def test_append_index_validates_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(139)
    X = rng.normal(0, 1, (40, 8))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=8, m=2, k=4, iterations=1)
    cents = S.seeded_centroids(8, 4, seed=7, scale=1.0)
    enc = S.ivf_assign(PQ.pq_encode(df, model), cents)
    path = str(tmp_path / "idx")
    PQ.write_pq_index(
        path, model, enc.select("vec_id", "embedding", "pq_code", "ivf_cell"),
        cell_col="ivf_cell", centroids=cents,
    )
    with pytest.raises(ValueError, match="lacks columns"):
        PQ.append_pq_index(
            spark, path,
            df.select(F.col("vec_id").alias("other_key"), "embedding"),
        )


def test_fused_encode_assign_bit_equals_sequential(spark):
    """pq_encode(centroids=...) — the ONE-pass encode+coarse-assign the
    index-build queries run — must be bit-identical to the sequential
    pq_encode → ivf_assign (interpreted-HOF reference) composition: same
    codes, same cells, for every row.  Pins the r14 fusion (one Python
    round-trip instead of two, GEMM instead of per-row HOF folds)."""
    from fs2_kinesis_firehose_spark.operators import similarity as S

    rng = np.random.default_rng(23)
    X = rng.normal(0, 1, (200, 16))
    df = _emb_df(spark, X)
    model = PQ.pq_fit(df, vec_col="embedding", dim=16, m=4, k=8, iterations=2)
    cents = S.seeded_centroids(16, 6, seed=7, scale=0.5)

    fused = {
        r["vec_id"]: (list(r["pq_code"]), r["ivf_cell"])
        for r in PQ.pq_encode(df, model, centroids=cents).collect()
    }
    seq = {
        r["vec_id"]: (list(r["pq_code"]), r["ivf_cell"])
        for r in S.ivf_assign(PQ.pq_encode(df, model), cents).collect()
    }
    assert fused == seq
