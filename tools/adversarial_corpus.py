"""Build the ADVERSARIAL oracle-sweep corpus: sf0.001 with extra
documents engineered to expose engine-vs-oracle GRAIN and
NULL-discipline divergences that the generated corpora never trigger.

The r12 review found two such latent divergences in staged queries
(intra-doc duplicate shingles — per-occurrence vs per-distinct-window
counting; empty tokens — a '' sentinel silently dropping them), and
the first full sweep over this corpus found four more in REGISTERED
queries (two empty-payload grain drops in mm oracles, two
divide-by-zero paths). Every doc below exists because some class of
query is blind without it:

- intra-doc repeated shingle  -> per-occurrence vs distinct counting
- double/triple spaces        -> empty tokens through every tokenizer
- leading/trailing space+tabs -> boundary tokens, trim assumptions
- single token                -> n-gram/window generators at n < w
- EMPTY TEXT                  -> zero-weight/zero-length divisions,
                                 empty-payload codec rows, grain drops
- one token repeated 12x      -> degenerate distributions (entropy 0)
- mixed case + overlong token -> lower() and length-filter parity
- exact prefix of another doc -> containment/suffix-prefix families

Usage:
    python tools/adversarial_corpus.py [out_dir]     # default /tmp/sf_adversarial
    python tools/oracle_check.py /tmp/sf_adversarial # the sweep itself

Run the sweep before every flip: a hash mismatch here is a latent
driver-gate failure waiting for a corpus regeneration.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

SRC = Path("/root/testdata/sf0.001")


def adversarial_docs(base_text: str, langs: list, sources: list, next_id: int):
    five = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    adv = [
        f"{five} bridge words here {five} tail tokens close out now",
        "lead  token triple   gap mid tail  end word list goes on here",
        " padded start token\tmixed tab separators here trailing end ",
        "solitary",
        "",
        "echo echo echo echo echo echo echo echo echo echo echo echo",
        "SHOUTING MixedCase lowertoken EXTRAORDINARILYLONGTOKENHERE ok",
        base_text[: max(40, len(base_text) // 3)],
    ]
    return [
        {
            "doc_id": next_id + i,
            "text": t,
            "lang": langs[i % len(langs)],
            "source": sources[i % len(sources)],
            "n_chars": len(t),
        }
        for i, t in enumerate(adv)
    ]


def build(out_dir: str) -> str:
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = Path(out_dir)
    dst.mkdir(parents=True, exist_ok=True)
    for p in SRC.glob("*.parquet"):
        if p.name != "documents.parquet":
            shutil.copy(p, dst / p.name)
    docs = duckdb.sql(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    ).df()
    rows = adversarial_docs(
        docs.text.iloc[0],
        sorted(docs.lang.unique()),
        sorted(docs.source.unique()),
        int(docs.doc_id.max()) + 1,
    )
    out = pd.concat([docs, pd.DataFrame(rows)], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        str(dst / "documents.parquet"),
    )
    return str(dst)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_adversarial"
    print(f"adversarial corpus -> {build(out)}")
