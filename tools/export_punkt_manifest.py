#!/usr/bin/env python3
"""Export a trained punkt sentence-tokenizer's parameter tables as a
JSONL manifest for graft.text.PunktManifest.ingest.

Runs ONCE in the REFERENCE environment (needs nltk + the punkt data
package), exactly like export_model_manifest.py for the n-gram model
pickles: the JVM cannot (and should not) unpickle, so the migration
artifact is the model's learned state in a neutral format.

Punkt's learned state is four tables (nltk/tokenize/punkt.py
PunktParameters):
  - abbrev_types:  lowercase types sans final period
  - collocations:  (type_no_period, type_no_sentperiod) pairs
  - sent_starters: frequent sentence-starter types
  - ortho_context: type -> _ORTHO_* flag bit-or

Usage:
    python3 export_punkt_manifest.py [language] [out.jsonl]
Defaults: english, punkt_manifest.jsonl
"""
import json
import sys


def main() -> None:
    lang = sys.argv[1] if len(sys.argv) > 1 else "english"
    out = sys.argv[2] if len(sys.argv) > 2 else "punkt_manifest.jsonl"

    import nltk  # public API only

    tok = nltk.data.load(f"tokenizers/punkt/{lang}.pickle")
    p = tok._params

    n = 0
    with open(out, "w", encoding="utf-8") as f:
        for a in sorted(p.abbrev_types):
            f.write(json.dumps({"kind": "abbrev", "w1": a}) + "\n")
            n += 1
        for w1, w2 in sorted(p.collocations):
            f.write(json.dumps({"kind": "collocation", "w1": w1, "w2": w2}) + "\n")
            n += 1
        for s in sorted(p.sent_starters):
            f.write(json.dumps({"kind": "sent_starter", "w1": s}) + "\n")
            n += 1
        for t, flags in sorted(p.ortho_context.items()):
            f.write(json.dumps({"kind": "ortho", "w1": t, "flags": int(flags)}) + "\n")
            n += 1
    print(f"wrote {n} rows to {out}")


if __name__ == "__main__":
    main()
