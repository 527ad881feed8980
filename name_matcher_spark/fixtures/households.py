"""Household-aggregation golden scenario (FIXTURES.md §3, mirroring
tests/option5_households_hhid.rs:25-88).

T1 household A-UUID has 3 members; T2 household 100 matches 2 of them
(66.7% -> kept) and household 102 matches 1 (33.3% -> dropped).
B-UUID has 2 members, both matched in household 101 (100% -> kept).
Extras: an exact-50% household (excluded by the strict >50 rule), a
1-member household (100%), and a confidence tie across two T2
households (person dropped entirely, mod.rs:378-386).
"""

from __future__ import annotations

from datetime import date

import pandas as pd


def make_household_scenario() -> tuple[pd.DataFrame, pd.DataFrame, set[tuple[str, str]]]:
    """Returns (t1, t2, expected_kept) where expected_kept is the set of
    (uuid, hh_id) rows the aggregation must emit."""
    bd = date(1980, 6, 15)
    t1_rows = [
        # A-UUID: 3 members
        (1, "A-UUID", "Alice", None, "Quirk", bd),
        (2, "A-UUID", "Bob", None, "Quirk", bd),
        (3, "A-UUID", "Cara", None, "Quirk", bd),
        # B-UUID: 2 members
        (4, "B-UUID", "Dan", None, "Woble", bd),
        (5, "B-UUID", "Eve", None, "Woble", bd),
        # C-UUID: 2 members, exactly 1 matches -> 50% -> excluded
        (6, "C-UUID", "Finn", None, "Zorn", bd),
        (7, "C-UUID", "Gus", None, "Zorn", bd),
        # D-UUID: single member -> 100%
        (8, "D-UUID", "Hana", None, "Yarrow", bd),
        # E-UUID: member with a confidence tie across two households
        (9, "E-UUID", "Ivan", None, "Vex", bd),
        (10, "E-UUID", "Jon", None, "Vex", bd),
    ]
    t2_rows = [
        # hh 100: matches Alice + Bob (2/3 of A-UUID)
        (11, "100", "Alice", None, "Quirk", bd),
        (12, "100", "Bob", None, "Quirk", bd),
        # hh 102: matches Cara only (1/3)
        (13, "102", "Cara", None, "Quirk", bd),
        # hh 101: matches Dan + Eve (2/2 of B-UUID)
        (14, "101", "Dan", None, "Woble", bd),
        (15, "101", "Eve", None, "Woble", bd),
        # hh 103: matches Finn only (1/2 of C-UUID -> 50%, excluded)
        (16, "103", "Finn", None, "Zorn", bd),
        # hh 104: matches Hana (1/1)
        (17, "104", "Hana", None, "Yarrow", bd),
        # hh 105 and 106: both match Ivan exactly -> tie -> Ivan dropped;
        # Jon matches only in 105 -> E-UUID/105 = 1/2 = 50% -> excluded.
        (18, "105", "Ivan", None, "Vex", bd),
        (19, "106", "Ivan", None, "Vex", bd),
        (20, "105", "Jon", None, "Vex", bd),
    ]
    t1 = pd.DataFrame(
        t1_rows, columns=["id", "uuid", "first_name", "middle_name", "last_name", "birthdate"]
    )
    t1["hh_id"] = None
    t1["hh_id"] = t1["hh_id"].astype(object)
    t2 = pd.DataFrame(
        t2_rows, columns=["id", "hh_id", "first_name", "middle_name", "last_name", "birthdate"]
    )
    t2["uuid"] = None
    t2["uuid"] = t2["uuid"].astype(object)
    t2 = t2[["id", "uuid", "first_name", "middle_name", "last_name", "birthdate", "hh_id"]]
    expected = {("A-UUID", "100"), ("B-UUID", "101"), ("D-UUID", "104")}
    return t1, t2, expected
