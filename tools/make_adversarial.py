#!/usr/bin/env python3
"""Adversarial-layout fixture generator.

The driver's parquet has data properties the synthetic /root/testdata
tables never exhibit (verified r7: zero nulls in events.event_type,
events.value, documents.source, documents.lang at every local SF), so
the exact divergence class that produced three driver-red rounds (null
key -> Spark NULLS FIRST vs DuckDB NULLS LAST row-order flip) could
never reproduce locally.  This tool derives an adversarial variant of
the sf0.001 tables into <outdir>:

  events:     ~3% null event_type, ~3% null value, ~1% NaN value,
              ~2% negative value, ~2% null user_id, ~1% null ts,
              a pre-epoch ts, duplicated (user, ts) pairs,
              ts written as TIMESTAMP(NANOS) (the driver variant)
  documents:  ~3% null source, ~3% null lang, a null text, empty and
              whitespace-only text, non-ASCII text (sharp-s, dotted-I,
              CJK, emoji, combining accents), tabs/CRLF text
  embeddings: a zero-norm vector, a null label

All other tables are copied verbatim.  Deterministic (seed=7).
Usage: make_adversarial.py [outdir]   (default /root/repo/testdata-adv)
"""
import shutil, sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-adv"
COPY = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

rng = np.random.default_rng(7)


def mask(n, frac):
    m = np.zeros(n, dtype=bool)
    m[rng.choice(n, size=max(1, int(n * frac)), replace=False)] = True
    return m


def events():
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    event_id = t["event_id"].to_numpy().copy()
    ts = t["ts"].cast(pa.timestamp("us")).to_numpy().copy()  # datetime64[us]
    user = t["user_id"].to_numpy(zero_copy_only=False).astype("float64")
    etype = t["event_type"].to_pylist()
    value = t["value"].to_numpy(zero_copy_only=False).astype("float64").copy()
    props = t["props"].to_pylist()

    et_null = mask(n, 0.03)
    for i in np.flatnonzero(et_null):
        etype[i] = None
    v_null, v_nan, v_neg = mask(n, 0.03), mask(n, 0.01), mask(n, 0.02)
    value[v_null] = np.nan  # carried as validity-null below
    value[v_nan & ~v_null] = np.nan  # true NaN (validity stays set)
    value[v_neg & ~v_null & ~v_nan] *= -1.0
    u_null = mask(n, 0.02)
    ts_null = mask(n, 0.01)
    # one pre-epoch timestamp among the valid ones
    pre = np.flatnonzero(~ts_null)[0]
    ts[pre] = np.datetime64("1969-12-31T23:59:58.123456", "us")
    # duplicated (user, ts) pairs: clone 10 rows with fresh event_ids so
    # tie-break columns (event_id) are genuinely exercised
    dup_src = np.flatnonzero(~u_null & ~ts_null & ~et_null)[:10]
    base_id = int(event_id.max()) + 1

    ts_ns = ts.astype("datetime64[ns]")
    arrs = {
        "event_id": pa.array(np.concatenate([event_id, base_id + np.arange(10)])),
        "ts": pa.array(
            np.concatenate([ts_ns, ts_ns[dup_src]]),
            mask=np.concatenate([ts_null, np.zeros(10, dtype=bool)]),
            type=pa.timestamp("ns"),
        ),
        "user_id": pa.array(
            np.concatenate([user, user[dup_src]]).astype("int64"),
            mask=np.concatenate([u_null, np.zeros(10, dtype=bool)]),
        ),
        "event_type": pa.array(etype + [etype[i] for i in dup_src], type=pa.string()),
        "value": pa.array(
            np.concatenate([value, value[dup_src]]),
            mask=np.concatenate([v_null, v_null[dup_src]]),
        ),
        "props": pa.array(props + [props[i] for i in dup_src], type=pa.string()),
    }
    pq.write_table(pa.table(arrs), f"{OUT}/events.parquet")


WEIRD_TEXT = [
    None,
    "",
    "   \t  ",
    "\r\n\r\n",
    "straße STRASSE Weiß der die das und nicht ist ein",
    "İstanbul'da diakritikler: ğüşöçı İIıi",
    "中文文本没有空格分词是一个挑战 的 是 不 了 在 我 有",
    "emoji soup 🚀🔥💯 mixed with the and of is to in that words",
    "combining áccents élève résumé the and of",
    "tab\tseparated\tfields\tthe\tand\tof",
    "el la los las es un una que " * 3,
    "le la les est une des dans " * 3,
    "ALL CAPS SHOUTING THE AND OF IS TO IN THAT",
    "a" * 500,
    "word " * 200,
    "der die das 🚀 und nicht ist ein straße",
]


def documents():
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    doc_id = t["doc_id"].to_numpy().copy()
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()

    s_null = mask(n, 0.03)
    l_null = mask(n, 0.03)
    for i in np.flatnonzero(s_null):
        source[i] = None
    for i in np.flatnonzero(l_null):
        lang[i] = None
    # overwrite a deterministic block of texts with the weird corpus
    idx = rng.choice(n, size=len(WEIRD_TEXT), replace=False)
    for j, i in enumerate(idx):
        text[i] = WEIRD_TEXT[j]
    n_chars = [len(s) if s is not None else None for s in text]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_id),
                "text": pa.array(text, type=pa.string()),
                "lang": pa.array(lang, type=pa.string()),
                "source": pa.array(source, type=pa.string()),
                "n_chars": pa.array(n_chars, type=pa.int64()),
            }
        ),
        f"{OUT}/documents.parquet",
    )


def embeddings():
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t["vec_id"].to_numpy().copy()
    emb = t["embedding"].to_pylist()
    label = t["label"].to_pylist()
    emb[3] = [0.0] * len(emb[3])  # zero-norm vector
    label[5] = None
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_id),
                "embedding": pa.array(emb, type=pa.list_(pa.float32())),
                "label": pa.array(label, type=pa.int32()),
            }
        ),
        f"{OUT}/embeddings.parquet",
    )


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in COPY:
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{OUT}/{name}.parquet")
    events()
    documents()
    embeddings()
    print(f"wrote adversarial fixture to {OUT}")


if __name__ == "__main__":
    main()
