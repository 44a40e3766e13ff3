"""End-to-end contact pipeline test — the reference's full run.py flow
(mailchimp enrich -> fill missing -> clean -> dedup -> validate) on
contact-shaped fixtures."""

from __future__ import annotations

from bcg_contacts_data_pipeline_spark.plans import contacts as C


def master_fixture(spark):
    cols = "seqno string, firstname string, lastname string, fullname string, email string, mobile string, notes string, isactive string, last_updated string, salutation string"
    rows = [
        # two duplicate Anns (same email) — merged, longest notes wins
        ("1", "ann", "lee", "Ann Lee", "A@X.com", "0412345678", "short", "y", "2023-01-01 10:00:00", "Ms"),
        ("2", "Ann", "Lee", "Ann Lee", "a@x.com", None, "a far longer note", "Y", "2024-01-01 10:00:00", None),
        # missing email + mobile -> filled from mailchimp on (name, phone)/(name, email)
        ("3", "Bob", "Roy", "Bob Roy", None, "5551234567", "nan", "n", "2024-02-02 09:00:00", None),
        # missing firstname/lastname -> filled from sources via 2-of-3
        ("4", None, None, "Cal Poe", "cal@x.com", "111222333", "", "bogus", "not a date", None),
        # keyless junk row — passes through dedup, SKIPPED by validation
        # (reference junk-row pre-filter, validate_fields.py:77-85)
        ("5", None, None, None, None, None, "keyless", None, None, None),
        # real validation case: present firstname but no lastname/email/phone
        ("6", "Eve", None, "Eve Kay", None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, cols)


def mailchimp_fixture(spark):
    return spark.createDataFrame(
        [
            (1, "Bob", "Roy", None, "bob@mc.com", "+1 555 123 4567"),
        ],
        "sid long, s_firstname string, s_lastname string, s_fullname string, s_email string, s_mobile string",
    )


def sources_fixture(spark):
    return spark.createDataFrame(
        [
            (1, "Cal", "Poe", "Cal Poe", "cal@x.com", "999"),
        ],
        "sid long, s_firstname string, s_lastname string, s_fullname string, s_email string, s_mobile string",
    )


def test_full_pipeline(spark):
    result = C.run_pipeline(
        master_fixture(spark),
        sources=sources_fixture(spark),
        mailchimp=mailchimp_fixture(spark),
    )
    rows = result.cleaned.collect()
    by_email = {r["email"]: r for r in rows if r["email"]}

    # dedup: the two Anns merged into one most-complete record
    ann = by_email["a@x.com"]
    assert ann["group_size"] == 2
    assert ann["notes"] == "a far longer note"
    assert ann["mobile"] == "0412345678"  # filled from the older dup
    assert ann["firstname"] == "Ann"  # title-cased
    assert ann["isactive"] == "Y"

    # mailchimp enrich: Bob's missing email filled on (name, phone) match
    bob = by_email["bob@mc.com"]
    assert bob["firstname"] == "Bob"

    # fill-missing: Cal's first/last filled via 2-of-3 (name+email)
    cal = by_email["cal@x.com"]
    assert cal["firstname"] == "Cal" and cal["lastname"] == "Poe"

    # unused fields forced NULL, sentinel strings gone
    assert all(r["salutation"] is None for r in rows)
    assert all(r["notes"] != "nan" for r in rows)

    # keyless row passed through unmerged
    assert sum(1 for r in rows if r["email"] is None and r["fullname"] is None) == 1

    # SEQNO contiguous 1..N
    seqnos = sorted(int(r["seqno"]) for r in rows)
    assert seqnos == list(range(1, len(rows) + 1))

    # validation: junk (all-null name+email) rows are SKIPPED; Eve's row
    # (firstname present) fails required lastname/email critically
    errors = result.errors.collect()
    eve = next(r for r in rows if r["firstname"] == "Eve")
    eve_errors = [e for e in errors if e["seqno"] == eve["seqno"]]
    assert eve_errors and eve_errors[0]["has_critical"]
    assert "Missing lastname" in eve_errors[0]["errors"]
    assert "No phone number present" in eve_errors[0]["errors"]
    # Ann's record is fully valid and junk row produced no error doc
    assert not [e for e in errors if e["seqno"] == ann["seqno"]]
    assert len(errors) == 1

    # audit logs exist
    assert result.mailchimp_log.count() >= 1
    assert result.fill_log.count() >= 1


def test_bug_compat_empty_key_merge(spark):
    df = master_fixture(spark)
    result = C.run_pipeline(df, merge_empty_keys=True)
    rows = result.cleaned.collect()
    # compat mode: all keyless rows collapse into one record (reference bug)
    keyless = [r for r in rows if r["email"] is None and r["fullname"] is None]
    assert len(keyless) == 1
