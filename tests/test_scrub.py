"""PII scrub: batch kernel vs an independent Python-re oracle (stdlib only)."""

import re

import pyarrow as pa

from document_processor_ray.functions.scrub import (
    SCRUB_RULES, augment_contact, scrub_batch)


def _oracle(text):
    counts, cur = [], text
    for _name, pat, rep in SCRUB_RULES:
        counts.append(len(re.findall(pat, cur)))
        cur = re.sub(pat, rep, cur)
    return counts, cur


CASES = [
    "",
    "no pii here at all",
    "mail me at a.b+c_d%e@sub.example.co or x@y.io thanks",
    "hosts 10.0.0.1 and 192.168.255.254, port 8080",
    "card 4111111111111111 ref 1234567 short 123456",
    "mixed u1@e.com 10.1.2.3 999999999 u1@e.com",
    "adjacent 1.2.3.4 5.6.7.8 and a@b.cc c@d.ee",
    "digits inside email stay one token: num123456789@mail.org",
    "tab\tand\nnewline 10.10.10.10\n12345678",
]


def test_scrub_matches_re_oracle():
    tbl = pa.table({"text": CASES})
    out = scrub_batch(tbl)
    for i, text in enumerate(CASES):
        counts, cur = _oracle(text)
        got = [out["n_email"][i].as_py(), out["n_ip"][i].as_py(),
               out["n_num"][i].as_py()]
        assert got == counts, (text, got, counts)
        assert out["scrubbed"][i].as_py() == cur, text


def test_scrub_sequential_no_double_count():
    # The email's 9-digit local part must NOT also count as a long number,
    # and the IP inside it must not count as an IP.
    tbl = pa.table({"text": ["123456789@x.io and 1.2.3.4 and 123456789"]})
    out = scrub_batch(tbl)
    assert out["n_email"][0].as_py() == 1
    assert out["n_ip"][0].as_py() == 1
    assert out["n_num"][0].as_py() == 1
    assert out["scrubbed"][0].as_py() == "<EMAIL> and <IP> and <NUM>"


def test_augment_matches_sql_concat_semantics():
    tbl = pa.table({"doc_id": pa.array([0, 7, 300], pa.int64()),
                    "text": ["a", "b", "c"]})
    out = augment_contact(tbl)
    for i, (did, txt) in enumerate(zip([0, 7, 300], ["a", "b", "c"])):
        want = (f"{txt} contact user{did}@example.com from "
                f"10.{did % 256}.0.{did % 100} acct {100000000 + did}")
        assert out["aug_text"][i].as_py() == want
    # and every augmented row fires each rule exactly once
    s = scrub_batch(out, text_col="aug_text")
    assert s["n_email"].to_pylist() == [1, 1, 1]
    assert s["n_ip"].to_pylist() == [1, 1, 1]
    assert s["n_num"].to_pylist() == [1, 1, 1]
