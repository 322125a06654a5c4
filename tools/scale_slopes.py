#!/usr/bin/env python
"""Empirical scale-slope study (SCALE.md §11): generate a deterministic
~10x documents/embeddings slice and measure wall-clock slopes of the
heaviest dedup/ANN battery entries at sf0.1 vs the 10x slice.

The slice mimics the sf0.1 testdata's structure (vocabulary extracted
from the real table, same length/lang/source mix, 64-dim label-clustered
unit embeddings) at 10x rows, written under /tmp — a one-off measurement
fixture, not a new testdata contract. Seeded numpy RNG (20260816) makes
it bit-reproducible.

Usage:
    python tools/scale_slopes.py gen            # write /tmp/spark_graft_sf1x
    python tools/scale_slopes.py run [entries]  # min-of-3 at both scales
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/spark_graft_sf1x")
SEED = 20260816
N_DOCS, N_VECS = 50_000, 20_000

# §12 family: multimodal codecs (pure-Python per-payload cost — the
# likeliest linear-but-steep family) + stateful/streaming entries. The
# media entries derive their payload corpora from documents.doc_id, so
# the same 10x documents slice scales them; the streaming event entries
# need the 10x events synth below.
MULTIMODAL_STREAMING_ENTRIES = [
    "multimodal_frame_decode",
    "multimodal_frame_sample",
    "multimodal_gif_interlaced",
    "multimodal_scene_cuts",
    "multimodal_image_phash",
    "multimodal_image_dhash",
    "multimodal_phash_near_pairs",
    "multimodal_phash_clusters",
    "multimodal_audio_decode",
    "multimodal_audio_haar_bands",
    "multimodal_media_router",
    "streaming_frame_decode",
    "streaming_media_router",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_stateful_totals",
    "streaming_windowed_topk",
    "streaming_dedup_within_watermark",
    "python_datasource_stream",
]

DEFAULT_ENTRIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_ngram_prefix_filter",
    "dedup_ngram_dfcap_pairs",
    "dedup_canonical_corpus",
    "dedup_connected_components",
    "dedup_semantic_clusters",
    "cdc_chunk_dedup",
    "embed_ivf_kmeans_topk",
    "embed_pq_adc_topk",
]


def gen() -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    vocab = sorted({
        w
        for (t,) in con.execute(
            f"SELECT text FROM read_parquet('{SRC}/documents.parquet') LIMIT 2000"
        ).fetchall()
        for w in t.split()
    })
    rows = con.execute(
        f"SELECT lang, count(*) FROM read_parquet('{SRC}/documents.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    langs = [r[0] for r in rows]
    weights = [r[1] for r in rows]
    nsrc = con.execute(
        f"SELECT count(DISTINCT source) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    wl_lo, wl_hi = con.execute(
        f"SELECT min(len(string_split(text,' '))), max(len(string_split(text,' ')))"
        f" FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchall()[0]

    rng = np.random.default_rng(SEED)
    lens = rng.integers(wl_lo, wl_hi + 1, size=N_DOCS)
    lang_idx = rng.choice(
        len(langs), size=N_DOCS, p=np.array(weights) / sum(weights)
    )
    src_idx = rng.integers(0, nsrc, size=N_DOCS)
    V = np.array(vocab)
    texts = [
        " ".join(V[rng.integers(0, len(V), size=lens[i])])
        for i in range(N_DOCS)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([langs[j] for j in lang_idx]),
                "source": pa.array([f"src{j}" for j in src_idx]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{DST}/documents.parquet",
    )

    cent = rng.normal(size=(10, 64))
    labels = rng.integers(0, 10, size=N_VECS)
    emb = cent[labels] * 0.8 + rng.normal(0, 0.35, size=(N_VECS, 64))
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [r.astype(np.float32) for r in emb],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        ),
        f"{DST}/embeddings.parquet",
    )
    # 10x events slice for the stateful-streaming family: same schema,
    # same 30-day window and type/user mix, 10x rows — densifies event
    # rate rather than stretching time (what a 10x-traffic product does)
    n_ev = 1_000_000
    ev_rng = np.random.default_rng(SEED + 1)
    base_us = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC in µs
    span_us = np.int64(30 * 24 * 3600) * 1_000_000
    ts_us = np.sort(
        ev_rng.integers(0, span_us, size=n_ev, dtype=np.int64)
    ) + base_us
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(
                    ev_rng.integers(1, 15_001, size=n_ev), pa.int64()
                ),
                "event_type": pa.array(
                    etypes[ev_rng.integers(0, 5, size=n_ev)]
                ),
                "value": pa.array(
                    ev_rng.uniform(0, 100, size=n_ev), pa.float64()
                ),
                "props": pa.array(
                    [
                        '{"k": %d}' % k
                        for k in ev_rng.integers(0, 100, size=n_ev)
                    ]
                ),
            }
        ),
        f"{DST}/events.parquet",
    )
    for t in (
        "region nation customer supplier part orders lineitem".split()
    ):
        if not os.path.exists(f"{DST}/{t}.parquet"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print("wrote", DST)


def run(entries: list[str]) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hiv_data_integration_spark.battery import QUERIES
    from hiv_data_integration_spark.battery_ext import EXT_QUERIES
    from hiv_data_integration_spark.battery_sql import SQL2_QUERIES
    from hiv_data_integration_spark.session import get_spark

    Q = {**QUERIES, **EXT_QUERIES, **SQL2_QUERIES}
    spark = get_spark(app_name="scale-slopes")
    out: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((SRC, "x1"), (DST, "x10")):
        for name in entries:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                Q[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            out.setdefault(name, {})[tag] = round(min(samples), 3)
            print(name, tag, out[name][tag], flush=True)
    for name, t in out.items():
        if "x1" in t and "x10" in t and t["x1"] > 0:
            t["slope"] = round(t["x10"] / t["x1"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "gen":
        gen()
    else:
        if not os.path.exists(f"{DST}/documents.parquet"):
            gen()
        args = sys.argv[2:]
        if args == ["s12"]:
            args = MULTIMODAL_STREAMING_ENTRIES
        run(args or DEFAULT_ENTRIES)
