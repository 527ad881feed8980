"""Seeded person-table generators mirroring the reference benchmark corpus.

Same LCG (state * 1664525 + 1013904223 mod 2^64, benchmark_seed.rs:
401-409), same name pools including the diacritic/Unicode cases
(benchmark_seed.rs:421-448), same error operators (typo sub/del/ins/
transpose, truncation, middle-drop; birthdate always kept exact —
benchmark_seed.rs:352-399), same mixture rates (clean: 20% exact dups
in A, 50% overlap in B; dirty: 30% fuzzy dups, 40% fuzzy overlap).

Unlike the reference (MySQL inserts + uuid4), these are pure functions
of the seed producing pandas DataFrames, and they ALSO emit the
labeled_pairs ground truth from generation provenance (FIXTURES.md §4).
"""

from __future__ import annotations

from datetime import date

import pandas as pd

_MASK = (1 << 64) - 1


class Lcg:
    """The reference's LCG (benchmark_seed.rs:403-408)."""

    def __init__(self, seed: int) -> None:
        self.state = seed & _MASK

    def next(self) -> int:
        self.state = (self.state * 1664525 + 1013904223) & _MASK
        return self.state


FIRST_NAMES = [
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "William", "Elizabeth", "David", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen", "Christopher",
    "Nancy", "Daniel", "Lisa", "Matthew", "Betty", "Anthony", "Margaret",
    "Mark", "Sandra", "Donald", "Ashley", "Steven", "Kimberly", "Paul",
    "Emily", "Andrew", "Donna", "Joshua", "Michelle",
    "José", "María", "François", "André", "René", "Zoë", "Chloé", "Anaïs",
    "Björn", "Søren", "Müller", "Günther", "Jürgen", "Łukasz", "Michał",
    "Ángel", "Sofía", "Nicolás", "Andrés",
    "Wei", "Ming", "Li", "Chen", "Wang", "Zhang", "Yuki", "Hiroshi", "Kenji",
    "Sakura", "Raj", "Priya", "Amit", "Sanjay", "Deepak", "Mohammed", "Ahmed",
    "Fatima", "Ali",
]
LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
    "Ramirez", "Lewis", "Robinson", "Walker", "Young", "Allen", "King",
    "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores",
    "García", "Rodríguez", "Martínez", "Hernández", "López", "González",
    "Pérez", "Sánchez", "Ramírez", "Müller", "Schmidt", "Schneider",
    "Fischer", "Weber", "Meyer", "Wagner", "Becker", "Schulz",
    "O'Brien", "O'Connor", "O'Neill", "Ó Súilleabháin", "Mc Donald",
    "Mc Carthy",
]
MIDDLE_NAMES = [
    "Lee", "Ann", "Marie", "Lynn", "Ray", "Mae", "Jo", "Jay", "Kim", "Sue",
    "A", "B", "C", "D", "E", "F", "G", "H", "J", "K", "L", "M", "N", "P",
    "R", "S", "T", "W",
]


def _random_birthdate(rng: Lcg) -> date:
    year = 1950 + rng.next() % 61
    month = 1 + rng.next() % 12
    day_max = 31 if month in (1, 3, 5, 7, 8, 10, 12) else 30 if month in (4, 6, 9, 11) else 28
    if month == 2 and year % 4 == 0:
        day_max = 29
    day = 1 + rng.next() % day_max
    return date(year, month, day)


def _base_record(rng: Lcg) -> dict:
    return {
        "first_name": FIRST_NAMES[rng.next() % len(FIRST_NAMES)],
        "middle_name": (
            MIDDLE_NAMES[rng.next() % len(MIDDLE_NAMES)]
            if rng.next() % 3 == 0
            else None
        ),
        "last_name": LAST_NAMES[rng.next() % len(LAST_NAMES)],
        "birthdate": _random_birthdate(rng),
    }


def _add_typo(name: str, rng: Lcg) -> tuple[str, str]:
    """Single-char error, reference semantics (benchmark_seed.rs:352-393)."""
    if not name:
        return name, "noop"
    chars = list(name)
    typo_type = rng.next() % 4
    if typo_type == 0:
        pos = rng.next() % len(chars)
        chars[pos] = chr(ord("a") + rng.next() % 26)
        return "".join(chars), "typo_sub"
    if typo_type == 1:
        if len(chars) > 1:
            pos = rng.next() % len(chars)
            del chars[pos]
            return "".join(chars), "typo_del"
        return name, "noop"
    if typo_type == 2:
        pos = rng.next() % (len(chars) + 1)
        chars.insert(pos, chr(ord("a") + rng.next() % 26))
        return "".join(chars), "typo_ins"
    if len(chars) > 1:
        pos = rng.next() % (len(chars) - 1)
        chars[pos], chars[pos + 1] = chars[pos + 1], chars[pos]
        return "".join(chars), "transpose"
    return name, "noop"


def _truncate(name: str, rng: Lcg) -> str:
    # Reference uses BYTE length for the bound but truncates chars
    # (benchmark_seed.rs:396-399); mirror that.
    if len(name.encode()) <= 2:
        return name
    keep = 2 + rng.next() % (len(name.encode()) - 2)
    return name[:keep]


def _finish(records: list[dict], uuid_prefix: str) -> pd.DataFrame:
    df = pd.DataFrame.from_records(records)
    df.insert(0, "id", range(1, len(df) + 1))
    df.insert(1, "uuid", [f"{uuid_prefix}-{i:08d}" for i in range(1, len(df) + 1)])
    df["hh_id"] = None
    df["hh_id"] = df["hh_id"].astype(object)
    return df[
        ["id", "uuid", "first_name", "middle_name", "last_name", "birthdate", "hh_id"]
    ]


def make_clean(size: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Clean corpus: A = 80% unique + 20% exact dups; B = 50% copies of
    A bases + 50% unique. Returns (a, b, labeled_pairs)."""
    rng = Lcg(seed)
    unique_count = max(1, int(size * 0.8))
    dup_count = size - unique_count

    base = [dict(_base_record(rng), base_idx=i) for i in range(unique_count)]
    a_records = [dict(r) for r in base]
    for _ in range(dup_count):
        src = base[rng.next() % len(base)]
        a_records.append(dict(src))

    overlap_count = int(size * 0.5)
    b_records = []
    for _ in range(overlap_count):
        src = base[rng.next() % len(base)]
        b_records.append(dict(src, variant="exact"))
    for i in range(size - overlap_count):
        b_records.append(dict(_base_record(rng), base_idx=-1 - i, variant="unique"))

    a = _finish([{k: v for k, v in r.items() if k != "base_idx"} for r in a_records], "A")
    b = _finish(
        [{k: v for k, v in r.items() if k not in ("base_idx", "variant")} for r in b_records],
        "B",
    )
    pairs = _labeled_pairs(a_records, b_records)
    return a, b, pairs


def make_dirty(size: int, seed: int = 1042) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Dirty corpus: A = 70% unique + 30% fuzzy dups; B = 40% fuzzy
    copies of A bases + 60% unique. Error mixture per
    benchmark_seed.rs:212-234 / 252-263; birthdate always exact."""
    rng = Lcg(seed)
    unique_count = max(1, int(size * 0.7))
    dup_count = size - unique_count

    base = [dict(_base_record(rng), base_idx=i) for i in range(unique_count)]
    a_records = [dict(r, variant="base") for r in base]
    for _ in range(dup_count):
        src = base[rng.next() % len(base)]
        error_type = rng.next() % 5
        first, last, variant = src["first_name"], src["last_name"], "exact"
        if error_type == 0:
            first, variant = _add_typo(first, rng)
        elif error_type == 1:
            last, variant = _add_typo(last, rng)
        elif error_type == 2:
            first, v1 = _add_typo(first, rng)
            last, _ = _add_typo(last, rng)
            variant = v1
        elif error_type == 3:
            first, variant = _truncate(first, rng), "truncate"
        mid = src["middle_name"] if rng.next() % 2 == 0 else None
        if mid is None and src["middle_name"] is not None and variant == "exact":
            variant = "mid_drop"
        a_records.append(
            {
                "first_name": first,
                "middle_name": mid,
                "last_name": last,
                "birthdate": src["birthdate"],
                "base_idx": src["base_idx"],
                "variant": variant,
            }
        )

    overlap_count = int(size * 0.4)
    b_records = []
    for _ in range(overlap_count):
        src = base[rng.next() % len(base)]
        error_type = rng.next() % 4
        first, last, variant = src["first_name"], src["last_name"], "exact"
        if error_type == 0:
            first, variant = _add_typo(first, rng)
        elif error_type == 1:
            last, variant = _add_typo(last, rng)
        b_records.append(
            {
                "first_name": first,
                "middle_name": src["middle_name"],
                "last_name": last,
                "birthdate": src["birthdate"],
                "base_idx": src["base_idx"],
                "variant": variant,
            }
        )
    for i in range(size - overlap_count):
        b_records.append(dict(_base_record(rng), base_idx=-1 - i, variant="unique"))

    a = _finish(
        [{k: v for k, v in r.items() if k not in ("base_idx", "variant")} for r in a_records],
        "A",
    )
    b = _finish(
        [{k: v for k, v in r.items() if k not in ("base_idx", "variant")} for r in b_records],
        "B",
    )
    pairs = _labeled_pairs(a_records, b_records)
    return a, b, pairs


def _labeled_pairs(a_records: list[dict], b_records: list[dict]) -> pd.DataFrame:
    """Ground truth from provenance: (id_a, id_b, label, variant) for
    every A-row/B-row pair sharing a base record, plus the B variant."""
    by_base_a: dict[int, list[int]] = {}
    for i, r in enumerate(a_records):
        bi = r.get("base_idx")
        if bi is not None and bi >= 0:
            by_base_a.setdefault(bi, []).append(i + 1)
    rows = []
    for j, r in enumerate(b_records):
        bi = r.get("base_idx")
        if bi is None or bi < 0:
            continue
        for id_a in by_base_a.get(bi, []):
            rows.append(
                {
                    "id_a": id_a,
                    "id_b": j + 1,
                    "label": True,
                    "variant": r.get("variant", "exact"),
                }
            )
    return pd.DataFrame(rows, columns=["id_a", "id_b", "label", "variant"])
