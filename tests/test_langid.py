"""Trained language-ID (operators/langid.py): the CCNet/fastText-role
char-n-gram one-vs-rest classifier.

The driver query (lang_id_trained_accuracy) certifies cross-engine
determinism against the DuckDB training replay; these tests certify the
part the fixture cannot — that the trainer actually discriminates
languages when the text carries real signal (the fixture's lang column is
synthetic noise, documented in queries/llm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import langid as L

# Public-knowledge sample phrases, four languages with real char-level signal.
_CORPUS = {
    "en": [
        "the cat sat on the mat and looked at the dog",
        "it is a truth universally acknowledged that a single man wants a wife",
        "she walked to the market to buy some fresh bread and milk",
        "the quick brown fox jumps over the lazy dog every morning",
    ],
    "de": [
        "der hund lief schnell durch den park und bellte laut",
        "die katze sitzt auf der matte und schaut den vogel an",
        "ich gehe heute mit meinen freunden in die stadt einkaufen",
        "das wetter ist schoen und die sonne scheint den ganzen tag",
    ],
    "fr": [
        "le chat est assis sur le tapis et regarde le chien",
        "je vais au marche pour acheter du pain frais et du lait",
        "la voiture rouge roule vite sur la route vers la ville",
        "il fait beau aujourd hui et le soleil brille toute la journee",
    ],
    "es": [
        "el gato esta sentado en la alfombra mirando al perro",
        "voy al mercado para comprar pan fresco y leche esta manana",
        "el coche rojo va rapido por la carretera hacia la ciudad",
        "hace buen tiempo hoy y el sol brilla durante todo el dia",
    ],
}


def _corpus_df(spark):
    rows = []
    for i, (lang, txts) in enumerate(sorted(_CORPUS.items())):
        for j, t in enumerate(txts):
            rows.append((i * 10 + j, t, lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_trained_lang_id_discriminates_real_language_signal(spark):
    df = _corpus_df(spark)
    feat = L.char_ngram_features(df, label_col="lang").localCheckpoint(eager=True)
    models = L.train_lang_id(feat, sorted(_CORPUS), iterations=8, n=16)
    pred = L.predict_lang(feat, models)
    stats = pred.agg(
        F.count_if(F.col("lang") == F.col("lang_pred")).alias("ok"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (stats.ok, stats.n) == (16, 16)


def test_trained_lang_id_deterministic_across_partitionings(spark):
    """Quantized gradients make the weights bit-identical regardless of how
    the features are partitioned — the whole point of the integer recipe."""
    df = _corpus_df(spark)
    feat = L.char_ngram_features(df, label_col="lang").localCheckpoint(eager=True)
    w1 = L.train_lang_id(feat, ["de", "en"], iterations=4, n=16)
    w2 = L.train_lang_id(
        feat.repartition(7).localCheckpoint(eager=True),
        ["de", "en"],
        iterations=4,
        n=16,
    )
    assert w1 == w2  # bit-exact, not approximately equal


def test_fused_train_bit_equals_sequential_logreg(spark):
    """The fused one-aggregate-per-iteration multiclass loop must produce
    weights BIT-EQUAL to training each class separately through
    classifier.logreg_train — same residuals, same rounding grid, same
    update order (this is what keeps the per-class DuckDB replay oracles
    valid)."""
    from fs2_kinesis_firehose_spark.operators.classifier import logreg_train

    df = _corpus_df(spark)
    feat = L.char_ngram_features(df, label_col="lang").localCheckpoint(eager=True)
    fused = L.train_lang_id(feat, ["de", "en", "fr"], iterations=3, n=16)
    for cls in ["de", "en", "fr"]:
        seq = logreg_train(
            feat.withColumn("_y", (F.col("lang") == cls).cast("int")),
            label_col="_y",
            dim=64,
            iterations=3,
            lr=4.0,
            n=16,
        )
        assert fused[cls] == seq, cls  # bit-exact, not approximately


def test_char_ngrams_edges_and_unicode(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "ab"), (3, None), (4, "日本語です")],
        "id long, t string",
    )
    out = {
        r.id: r.g
        for r in df.select("id", L.char_ngrams("t", 3).alias("g")).collect()
    }
    assert out[1] == ["abc", "bcd"]
    assert out[2] == []  # shorter than n
    assert out[3] is None or out[3] == []  # NULL text never explodes
    assert out[4] == ["日本語", "本語で", "語です"]  # codepoints, not bytes


def test_char_ngram_features_plan_is_jvm_only(spark):
    df = _corpus_df(spark)
    plan = (
        L.char_ngram_features(df, label_col="lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # codegen featurization, no UDFs


def test_predict_lang_alphabetical_tie_break(spark):
    """Two identical models ⇒ identical margins ⇒ earlier class name wins."""
    df = spark.createDataFrame([(1, [1.0, 2.0])], "doc_id long, x array<double>")
    w = [0.5, 0.25]
    pred = L.predict_lang(df, {"fr": w, "de": w}).collect()[0]
    assert pred.lang_pred == "de"


def test_sql_metacharacters_in_classes_and_columns(spark):
    """Class names and column names are DATA: a quote in a class string or
    a metacharacter in a column name must not break (or silently change)
    the interpolated SQL expressions (r13 advisory)."""
    rows = [
        (1, "the cat sat on the mat", "it's-en"),
        (2, "der hund lief schnell", "de`co l"),
        (3, "le chat est assis sur le tapis", "fr\\bs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, `my text` string, `lang it's` string")
    feat = L.char_ngram_features(
        df, text_col="my text", label_col="lang it's"
    ).localCheckpoint(eager=True)
    classes = ["it's-en", "de`co l", "fr\\bs"]
    models = L.train_lang_id(
        feat, classes, label_col="lang it's", iterations=2, n=3
    )
    assert set(models) == set(classes)
    # the backslash class must actually SEE its row: with default
    # escapedStringLiterals=false a bare \ vanishes in the literal and the
    # label never matches, leaving the all-zero-gradient initial weights
    assert models["fr\\bs"] != [0.0] * len(models["fr\\bs"])
    pred = L.predict_lang(feat, models, pred_col="pred it's").collect()
    assert all(r["pred it's"] in models for r in pred)


def test_train_lang_id_dim_mismatch_names_the_real_cause(spark):
    """A features/dim mismatch must be diagnosed as such, not blamed on an
    empty frame (the gradient shortfall fires in both cases)."""
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 0.5], "en"), (2, [1.0, 0.2], "de")],
        "doc_id long, x array<double>, lang string",
    )
    with pytest.raises(ValueError, match="dim mismatch"):
        L.train_lang_id(df, ["en", "de"], dim=64, iterations=1, n=2)


def test_train_lang_id_empty_features_with_explicit_n_raises(spark):
    """Explicit n > 0 over an empty frame must fail with a descriptive
    error, not a KeyError from the gradient lookup (r13 advisory)."""
    import pytest

    empty = spark.createDataFrame(
        [], "doc_id long, x array<double>, lang string"
    )
    with pytest.raises(ValueError, match="empty or fully length-filtered"):
        L.train_lang_id(empty, ["en", "de"], iterations=1, n=5)


def test_training_parallelism_floor_gates_both_directions(spark, monkeypatch):
    """r14: train_lang_id lifts a byte-tiny features frame to
    defaultParallelism (the interpreted HOF per-row work otherwise runs
    the whole loop on 1-2 tasks) and stands down when the byte estimate
    clears the gate; weights are bit-identical in both states (the
    integer-gradient contract)."""
    from fs2_kinesis_firehose_spark.operators import classifier as C

    df = _corpus_df(spark)
    feat = (
        L.char_ngram_features(df, label_col="lang")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    dp = spark.sparkContext.defaultParallelism
    floored = C.training_parallelism_floor(feat, 16, 65)
    assert floored.rdd.getNumPartitions() == dp
    monkeypatch.setattr(C, "_TRAIN_FLOOR_TARGET_BYTES", 1)
    unfloored = C.training_parallelism_floor(feat, 16, 65)
    assert unfloored is feat  # gate closed: frame untouched
    w_on = L.train_lang_id(feat, ["de", "en"], iterations=4, n=16)
    monkeypatch.undo()
    w_off = L.train_lang_id(feat, ["de", "en"], iterations=4, n=16)
    assert w_on == w_off
