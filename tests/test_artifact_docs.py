"""Doc-vs-artifact drift guard (VERDICT r4 weak #2).

Every benchmark number the READMEs quote is derived from the committed
artifact JSONs by scripts/doc_claims.py with the docs' exact formatting;
this test asserts each claim appears verbatim.  A README edited without
regenerating its artifact (or an artifact regenerated without refreshing
the README — the round-4 bench_realtime drift) fails here.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.doc_claims import claim_in_doc, claims


def test_doc_numbers_match_artifacts():
    missing = []
    for doc, claim, src in claims():
        with open(os.path.join(REPO, doc)) as f:
            if not claim_in_doc(claim, f.read()):
                missing.append(f"{doc}: {claim!r} (from {src})")
    assert not missing, (
        "doc numbers drifted from committed artifacts:\n  "
        + "\n  ".join(missing)
    )
