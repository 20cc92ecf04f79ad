#!/usr/bin/env python3
"""Export the reference's pickled NLTK models to a portable manifest.

The reference stores ~9,511 nltk.lm models as BYTEA pickles
(sql/schema.sql:88) and unpickles them client-side
(client/async_processing_client.py:263-287). Python pickles are not
readable from the JVM, so migration goes through this manifest: one
JSONL row per top-order n-gram count,

    {"model_key": "<yt_model_key>", "ngram": ["c1","c2","c3","w"], "count": 123}

which graft.score.ModelManifest.ingest rebuilds distributed into the
engine's (model_key, model_data) blob lake. Context counts are NOT
exported — for an MLE model they are exactly derivable
(count(ctx) = sum over w of count(ctx + w)), so the manifest stays
minimal and internally consistent by construction.

Runs in the REFERENCE environment (needs psycopg2 + nltk, matching the
pickles' nltk version — the reference pins nltk==3.8.1). Uses only the
public nltk.lm surface: model.order and model.counts.

Usage: export_model_manifest.py "<postgres dsn>" <out.jsonl>
"""
import json
import pickle
import sys

import psycopg2


def export(dsn: str, out_path: str) -> None:
    conn = psycopg2.connect(dsn)
    n_models = n_rows = 0
    with conn.cursor(name="models") as cur, open(out_path, "w") as out:
        cur.itersize = 16  # stream: models are large, fetch a few at a time
        cur.execute("SELECT yt_model_key, model_data FROM model_table "
                    "WHERE model_data IS NOT NULL")
        for key, blob in cur:
            if isinstance(blob, memoryview):
                blob = blob.tobytes()
            if not blob:
                continue
            model = pickle.loads(blob)
            n = model.order
            for ctx in model.counts[n].conditions():
                for word, c in model.counts[n][ctx].items():
                    out.write(json.dumps(
                        {"model_key": key, "ngram": list(ctx) + [word],
                         "count": int(c)}) + "\n")
                    n_rows += 1
            n_models += 1
    print(f"exported {n_models} models, {n_rows} n-gram rows -> {out_path}")


if __name__ == "__main__":
    export(sys.argv[1], sys.argv[2])
