"""GPG batch encryption for the SFMC encrypted upload path.

The reference runs an ordered, stateful UDTF chain — GPG_PARAMS /
JSON_TO_CSV / GPG_FILE_WRAPPER / GPG_ENCRYPT / GPG_PACKAGE_MESSAGE over
``partition by null order by row_number`` (marketing_cloud_data_
extension_upload.sql:87-99) — which is serial by construction. Our
design (SURVEY.md §2.1 D8): encrypt **per batch** on executors, giving
the same externally observable result (encrypted payload batches
uploaded; per-original-row results) with real parallelism.

The cipher is real: ops.openpgp writes RFC 4880 messages (PKESK +
AES-256 SEIPD with MDC) that GnuPG decrypts — proven in
tests/test_gpg_path.py against the gpg binary. When the configured
public key does not parse as an armored OpenPGP key (e.g. placeholder
fixtures), a clearly-marked deterministic stand-in armor is produced so
plumbing tests run without key material.
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import json

from .openpgp import encrypt_message, parse_public_key


def gpg_session_params(public_key: str) -> dict:
    """GPG_PARAMS equivalent (...upload.sql:88 returns GPG_PREFIX/KEY_ID/
    SESSION_KEY/PUBLIC_KEY). A parseable armored RSA key yields real
    material (key id + RSA numbers, plain ints so the dict pickles into
    executors); anything else yields digest-derived stub identifiers."""
    digest = hashlib.sha256(public_key.encode()).hexdigest()
    params = {
        "gpg_prefix": "omnata",
        "key_id": digest[:16],
        "session_key": digest[16:48],
        "public_key": public_key,
    }
    try:
        key = parse_public_key(public_key)
    except Exception:
        params["real"] = False
    else:
        params.update(
            real=True, key_id=key["key_id"], rsa_n=key["n"], rsa_e=key["e"]
        )
    return params


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
    one armored message per batch (real RFC 4880 when the session holds
    parsed key material)."""
    if session.get("real"):
        return encrypt_message(
            session["rsa_n"], session["rsa_e"], session["key_id"], contents.encode()
        )
    payload = base64.b64encode(contents.encode()).decode()
    body = "\n".join(payload[i : i + 64] for i in range(0, len(payload), 64))
    return (
        "-----BEGIN PGP MESSAGE----- (STUB: deterministic stand-in, "
        "not encrypted)\n"
        f"KeyID: {session['key_id']}\n\n{body}\n"
        "-----END PGP MESSAGE-----"
    )
