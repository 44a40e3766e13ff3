"""Deterministic reference-shaped fixture generator for the golden-file
CLI parity test (FIXTURES.md §1-§5).

Emits the reference's actual input layout: a 10k-row x 88-column
MergedDatabase.tsv master, a 31-column Mailchimp audience export
(data_files/1.tsv header family), an 8-column CRM export (4.tsv), the two
headerless ad-hoc lists the reference SKIPS (5.tsv / 6.tsv), and a
mailchimpclean.tsv for the stage-0 enrichment. Everything is derived
from the row index — no RNG — so the bytes are identical on every
machine and the pinned golden digests are meaningful.

Engineered properties (FIXTURES.md §1 "key fixture properties"):
- duplicate email groups with differing completeness and last_updated
  (most-complete merge + recency tiebreak fire);
- empty-email rows sharing fullname+mobile (fallback dedup key);
- rows with neither (keyless passthrough);
- rows missing one of {lastname, mobile} that match a source row on
  >= 2 of {name, email, phone} (k-of-n fill);
- rows missing email that the mailchimp stage fills on (name, phone);
- sentinel strings ('nan', 'None', 'NaN'), float-looking integers,
  junk Y/N flags, unparseable timestamps, UNUSED_FIELDS junk.
"""

from __future__ import annotations

from bcg_contacts_data_pipeline_spark.plans.contacts import MASTER_COLUMNS

N_ROWS = 10_000

MAILCHIMP_HEADER = (
    "Email Address\tFirst Name\tLast Name\tAddress\tPhone Number\t"
    "Mobile Number\tStore/Organisation\tTitle\tIndustry\tSales Rep\t"
    "Purchase Option\tGroup Type\tID\tBrand\tMEMBER_RATING\tOPTIN_TIME\t"
    "OPTIN_IP\tCONFIRM_TIME\tCONFIRM_IP\tLATITUDE\tLONGITUDE\tGMTOFF\t"
    "DSTOFF\tTIMEZONE\tCC\tREGION\tLAST_CHANGED\tLEID\tEUID\tNOTES\tTAGS"
)

CRM_HEADER = (
    "First Name\tLast Name\tJob Title\tPhone\tEmail\tMobile\tFull Name\t"
    "Company Name"
)


def _ts(i: int) -> str:
    return (
        f"20{10 + i % 15}-{1 + i % 12:02d}-{1 + i % 28:02d} "
        f"{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}.000"
    )


def _master_row(i: int) -> dict[str, str]:
    r = {c: "" for c in MASTER_COLUMNS}
    r["seqno"] = str(i + 1)
    seg = i % 10
    r["firstname"] = f"First{i}"
    r["lastname"] = f"Last{i}"
    r["fullname"] = f"First{i} Last{i}"
    r["title"] = ["CEO", "Manager", "owner", ""][i % 4]
    r["last_updated"] = _ts(i)
    r["isactive"] = ["Y", "N", "y", "no", "junk", ""][i % 6]
    r["email"] = f"user{i}@corp.example"
    r["mobile"] = f"04{i:08d}"

    if seg == 0:
        # duplicate-email pair (i and i+10 share dup{i//20}): member A is
        # less complete (no mobile), member B has no lastname — the merge
        # must stitch the most-complete record from both.
        r["email"] = f"dup{i // 20}@corp.example"
        if (i // 10) % 2 == 0:
            r["mobile"] = ""
            r["notes"] = "member A keeps names"
        else:
            r["lastname"] = ""
            r["fullname"] = ""
            r["mobile"] = f"0455{i // 20:06d}"
    elif seg == 1:
        # fallback-key pair: no email, shared fullname+mobile
        r["email"] = ""
        r["firstname"] = "Fall"
        r["lastname"] = f"Back{i // 20}"
        r["fullname"] = f"Fall Back{i // 20}"
        r["mobile"] = f"0477{i // 20:06d}"
    elif seg == 2:
        # keyless: no email, no fullname, no mobile
        r["email"] = ["", "nan", "not-an-email"][i % 3]
        r["fullname"] = ["", "None", "NaN"][i % 3]
        r["mobile"] = ""
    elif seg == 3:
        # needy: missing mobile; matches mailchimp source on name+email
        r["firstname"] = f"Src{i}"
        r["lastname"] = "Match"
        r["fullname"] = f"Src{i} Match"
        r["email"] = f"src{i}@corp.example"
        r["mobile"] = ""
    elif seg == 4:
        # needy: missing BOTH name parts; the name match key falls back
        # to fullname, matches the CRM source on name+email, and the fill
        # restores firstname/lastname from the CRM columns
        r["firstname"] = ""
        r["lastname"] = ""
        r["fullname"] = f"Crm{i} Person"
        r["email"] = f"crm{i}@corp.example"
        r["mobile"] = f"0422{i:06d}"
    elif seg == 5:
        # missing email; the mailchimp stage fills it on (name, phone)
        r["firstname"] = f"Mc{i}"
        r["lastname"] = "Fillme"
        r["fullname"] = f"Mc{i} Fillme"
        r["email"] = ""
        r["mobile"] = f"0433{i:06d}"
    else:
        # regular rows with reference dirt
        if i % 23 == 0:
            r["email"] = "not-an-email"
        if i % 37 == 0:
            r["firstname"] = "nan"
        if i % 29 == 0:
            r["mobile"] = "12"  # too short -> invalid phone
        if i % 41 == 0:
            r["last_updated"] = "not-a-date"
        if i % 31 == 0:
            r["mobile"] = f"+61 (0)2 88{i % 100:02d} 2314"

    # integer preservation dirt + unused-field junk + tri-boolean subs
    r["salesno"] = f"{1000 + i}.0" if i % 11 == 0 else str(1000 + i)
    r["company_accno"] = str(5000 + i % 700)
    r["post_code"] = f"{3000 + i % 800}.0" if i % 13 == 0 else str(3000 + i % 800)
    r["address1"] = f"{i} Example St  "
    r["x_region"] = "JUNK-TO-NULL"
    r["latitude"] = "'-32.1000000"
    r["sub1"] = ["Y", "N", "maybe"][i % 3]
    r["sub2"] = ["y", "n", ""][i % 3]
    r["optout_emarketing"] = ["Y", "N", "junk"][i % 3]
    r["notes"] = r["notes"] or f"note {i}"
    r["name"] = r["fullname"]
    return r


def write_master(path: str) -> None:
    with open(path, "w") as f:
        f.write("\t".join(MASTER_COLUMNS) + "\n")
        for i in range(N_ROWS):
            row = _master_row(i)
            f.write("\t".join(row[c] for c in MASTER_COLUMNS) + "\n")


def _mc_row(**cells: str) -> str:
    cols = MAILCHIMP_HEADER.split("\t")
    return "\t".join(cells.get(c, "") for c in cols)


def write_mailchimp_source(path: str) -> None:
    """data_files/1.tsv family: fills seg-3 rows' mobiles on name+email.
    Includes the 'First Name holds a full name' pattern and a Phone
    Number cell that is blank where Mobile Number is not (the registry's
    coalesce keeps the contact key)."""
    with open(path, "w") as f:
        f.write(MAILCHIMP_HEADER + "\n")
        for i in range(3, N_ROWS, 10):
            f.write(
                _mc_row(
                    **{
                        "Email Address": f"src{i}@corp.example",
                        "First Name": f"Src{i}",
                        "Last Name": "Match",
                        "Phone Number": (
                            f"(07) 47{i % 100:02d} 1303" if i % 20 == 3 else ""
                        ),
                        "Mobile Number": f"0405{i:06d}",
                        "Title": "Owner",
                        "ID": str(i),
                        "MEMBER_RATING": str(1 + i % 5),
                    }
                )
                + "\n"
            )
        # full-name-in-First-Name row (FIXTURES.md §2 hassan pattern)
        f.write(
            _mc_row(
                **{
                    "Email Address": "hassan@corp.example",
                    "First Name": "Hassan Derani Lawson",
                    "Phone Number": "(07) 4742 1303",
                    "ID": "999999",
                    "MEMBER_RATING": "2",
                }
            )
            + "\n"
        )


def write_crm_source(path: str) -> None:
    """data_files/4.tsv: fills seg-4 rows' lastnames on name+email; has a
    whitespace-only row and a trailing-space Full Name."""
    with open(path, "w") as f:
        f.write(CRM_HEADER + "\n")
        f.write(" \t \t \t \t \t \t \t \n")  # whitespace-only row
        for i in range(4, N_ROWS, 10):
            f.write(
                f"Crm{i}\tPerson\tDirector\t\tcrm{i}@corp.example\t"
                f"0466{i:06d}\tCrm{i} Person \tAcme {i}\n"
            )


def write_mailchimpclean(path: str) -> None:
    """mailchimpclean.tsv (stage 0): fills seg-5 rows' emails on
    (name, phone)."""
    with open(path, "w") as f:
        f.write(MAILCHIMP_HEADER + "\n")
        for i in range(5, N_ROWS, 10):
            f.write(
                _mc_row(
                    **{
                        "Email Address": f"mc{i}@corp.example",
                        "First Name": f"Mc{i}",
                        "Last Name": "Fillme",
                        "Mobile Number": f"0433{i:06d}",
                        "ID": str(i),
                        "MEMBER_RATING": "3",
                    }
                )
                + "\n"
            )


def write_adhoc_lists(path5: str, path6: str) -> None:
    """Headerless 5.tsv / 6.tsv — first data row misread as a header with
    no recognizable columns, so the reference (and the CLI's
    usable_source gate) skips both."""
    with open(path5, "w") as f:
        for i in range(101):
            f.write(f"Scott{i}\tQRS\tscott{i}@qldretailsupplies.com.au\t\t\n")
    with open(path6, "w") as f:
        for i in range(181):
            f.write(f"Store {i}\tPeter & Jodi Sharman\towner{i}@corp.example\n")


def write_all(d: str) -> dict[str, str]:
    """Write every fixture into directory ``d``; returns name->path."""
    import os

    paths = {
        "master": os.path.join(d, "MergedDatabase.tsv"),
        "mailchimp_src": os.path.join(d, "1.tsv"),
        "crm": os.path.join(d, "4.tsv"),
        "adhoc5": os.path.join(d, "5.tsv"),
        "adhoc6": os.path.join(d, "6.tsv"),
        "mailchimpclean": os.path.join(d, "mailchimpclean.tsv"),
    }
    write_master(paths["master"])
    write_mailchimp_source(paths["mailchimp_src"])
    write_crm_source(paths["crm"])
    write_adhoc_lists(paths["adhoc5"], paths["adhoc6"])
    write_mailchimpclean(paths["mailchimpclean"])
    return paths
