"""PII redaction over the `documents` table (training-data ops).

A standard pre-training curation stage: detect and mask emails, phone
numbers, and IPv4 addresses before text ships to a training corpus. The
whole stage is Arrow-native — RE2 regexes run inside
``pyarrow.compute`` C++ kernels (``count_substring_regex`` /
``replace_substring_regex``), zero Python per row — so it streams at
``map_batches`` speed at any corpus size. DuckDB also uses RE2, so the
oracle runs the *same* pattern strings through ``regexp_extract_all`` /
``regexp_replace(..., 'g')`` and must agree byte-for-byte.

The synthetic `documents` table contains no real PII, so both sides first
inject deterministic synthetic PII into a doc_id-keyed subset (the
injection is test scaffolding, vectorized Arrow string ops on the Ray
side and string concat in SQL); the redaction kernel is the thing under
test. A real deployment deletes ``inject=True`` and runs the redactor
directly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from olrx.ops.scaling import actor_pool

#: RE2 syntax, shared verbatim with the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: replacement order matters only in that placeholders must not re-match a
#: later pattern: ``[EMAIL]`` / ``[PHONE]`` contain no digits or ``@``.
_RULES = (("n_emails", EMAIL_RE, "[EMAIL]"),
          ("n_phones", PHONE_RE, "[PHONE]"),
          ("n_ips", IPV4_RE, "[IP]"))


def _inject_pii(batch: pa.Table) -> pa.ChunkedArray:
    """Deterministically append synthetic PII to a doc_id-keyed subset.

    Vectorized end-to-end (``if_else`` + ``binary_join_element_wise`` +
    ``utf8_lpad``); mirrors the SQL injection in ``sql_text_redact``
    exactly, byte-for-byte."""
    did = pc.cast(batch["doc_id"], pa.int64())
    empty = pa.array([""] * len(batch), pa.string())

    def pick(modulus: int, *parts) -> pa.Array:
        mask = pc.equal(_mod(did, modulus), 0)
        # scalars broadcast; final "" is the element-wise-join separator
        sfx = pc.binary_join_element_wise(*parts, "")
        return pc.if_else(mask, sfx, empty)

    email = pick(7, " mail user", pc.cast(did, pa.string()), "@example.com")
    phone = pick(11, " tel 555-",
                 pc.utf8_lpad(pc.cast(_mod(did, 1000), pa.string()), 3, "0"),
                 "-",
                 pc.utf8_lpad(pc.cast(_mod(did, 10000), pa.string()), 4, "0"))
    ip = pick(13, " ip 10.",
              pc.cast(_mod(did, 256), pa.string()), ".",
              pc.cast(_mod(pc.divide(did, 3), 256), pa.string()), ".",
              pc.cast(_mod(pc.divide(did, 7), 256), pa.string()))
    return pc.binary_join_element_wise(batch["text"], email, phone, ip, "")


def _mod(a, m: int):
    """Integer modulo via Arrow kernels (pc.divide on int64 truncates)."""
    return pc.subtract(a, pc.multiply(pc.divide(a, m), m))


class Redactor:
    """Stateless in Python terms (RE2 compilation happens inside the Arrow
    kernel cache), but shaped as a callable class so the stage slots into
    the same actor-pool pattern as the other text ops."""

    def __init__(self, inject: bool = True) -> None:
        self.inject = inject

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = _inject_pii(batch) if self.inject else batch["text"]
        out = batch.select(["doc_id"])
        for col, pat, repl in _RULES:
            out = out.append_column(
                col, pc.cast(pc.count_substring_regex(t, pat), pa.int64()))
            t = pc.replace_substring_regex(t, pat, repl)
        return out.append_column("clean_text", t)


def q_text_redact(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(Redactor, batch_format="pyarrow", batch_size=8192,
                          concurrency=actor_pool())


def sql_text_redact(sf_dir: str) -> str:
    return rf"""
WITH d AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 7 = 0
            THEN ' mail user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' ip 10.' || (doc_id % 256) || '.' || ((doc_id // 3) % 256)
                 || '.' || ((doc_id // 7) % 256)
            ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(t,
           '{EMAIL_RE}', '[EMAIL]', 'g'), '{PHONE_RE}', '[PHONE]', 'g'),
           '{IPV4_RE}')) AS BIGINT) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{EMAIL_RE}', '[EMAIL]', 'g'),
      '{PHONE_RE}', '[PHONE]', 'g'),
      '{IPV4_RE}', '[IP]', 'g') AS clean_text
FROM d
"""
