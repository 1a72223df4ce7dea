#!/usr/bin/env python3
"""Convert the reference's hand-authored validation workbook
(`tests/data/mapping_test_data.xlsx`) and external CSVs into parquet test
fixtures under src/test/resources/corpus/, mirroring the cleanup done by
`tests/test_rules.py:73-128` (drop Unnamed columns, drop all-NaN rows, strip
`SCHEMA.` prefixes from column names).

Raw-XML xlsx reader (no openpyxl in this container): shared strings, style
table for date-formatted numerics, per-sheet cell grid.
"""
import re
import sys
import zipfile
from datetime import datetime, timedelta
from pathlib import Path
from xml.etree import ElementTree as ET

import pandas as pd

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
EPOCH = datetime(1899, 12, 30)
BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))


def col_to_idx(ref: str) -> int:
    m = re.match(r"([A-Z]+)", ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def load_xlsx(path):
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.iter(
                "{%s}t" % NS["m"])))
    # style index -> is-date
    date_styles = set()
    if "xl/styles.xml" in z.namelist():
        sroot = ET.fromstring(z.read("xl/styles.xml"))
        custom_date = set()
        for nf in sroot.iter("{%s}numFmt" % NS["m"]):
            code = nf.get("formatCode", "").lower()
            if re.search(r"[ymd]", re.sub(r"\[[^]]*\]|\"[^\"]*\"", "", code)):
                custom_date.add(int(nf.get("numFmtId")))
        xfs = sroot.find("m:cellXfs", NS)
        if xfs is not None:
            for i, xf in enumerate(xfs.findall("m:xf", NS)):
                fmt = int(xf.get("numFmtId", "0"))
                if fmt in BUILTIN_DATE_FMTS or fmt in custom_date:
                    date_styles.add(i)
    # workbook sheet name -> sheet file (rId order == sheetN order here)
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_file = {r.get("Id"): r.get("Target") for r in rels}
    sheets = {}
    for sh in wb.iter("{%s}sheet" % NS["m"]):
        rid = sh.get("{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id")
        sheets[sh.get("name")] = "xl/" + rid_to_file[rid].lstrip("/").removeprefix("xl/")

    out = {}
    for name, file in sheets.items():
        root = ET.fromstring(z.read(file))
        rows = []
        for row in root.iter("{%s}row" % NS["m"]):
            cells = {}
            for c in row.findall("m:c", NS):
                idx = col_to_idx(c.get("r"))
                t = c.get("t", "n")
                s = int(c.get("s", "-1"))
                v = c.find("m:v", NS)
                if v is None or v.text is None:
                    continue
                if t == "s":
                    cells[idx] = shared[int(v.text)]
                elif t in ("str", "inlineStr"):
                    cells[idx] = v.text
                elif t == "b":
                    cells[idx] = bool(int(v.text))
                else:
                    x = float(v.text)
                    if s in date_styles:
                        cells[idx] = EPOCH + timedelta(days=x)
                    else:
                        cells[idx] = x
            rows.append(cells)
        out[name] = rows
    return out


def to_df(rows):
    if not rows:
        return pd.DataFrame()
    header = rows[0]
    cols = {i: str(h) for i, h in header.items() if h is not None}
    data = {c: [] for c in cols.values()}
    for r in rows[1:]:
        for i, c in cols.items():
            data[c].append(r.get(i))
    df = pd.DataFrame(data)
    df = df[[c for c in df.columns if "Unnamed" not in c]]
    df = df.dropna(how="all").reset_index(drop=True)
    df.columns = [c.split(".")[-1] for c in df.columns]
    # Mixed str/number columns land in PG varchar columns via openpyxl→to_sql,
    # which renders integral numbers WITHOUT a trailing .0 (openpyxl yields
    # int for integral cells). Mirror that: any column containing a string
    # becomes all-string with int-rendered integral numerics.
    for c in df.columns:
        vals = df[c].dropna()
        if any(isinstance(v, str) for v in vals) and not vals.empty:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and pd.isna(v))
                              else (str(int(v)) if isinstance(v, float) and v == int(v)
                                    else str(v)))
    return df


def main():
    outdir = Path("src/test/resources/corpus")
    outdir.mkdir(parents=True, exist_ok=True)
    sheets = load_xlsx("/root/reference/tests/data/mapping_test_data.xlsx")
    sources = ["PERSON", "ENCOUNTER", "ENCNTR_LOC_HIST", "DIAGNOSIS", "PROBLEM",
               "ADDRESS", "NOMENCLATURE", "CODE_VALUE",
               "OMOP.CONCEPT", "OMOP.CONCEPT_RELATIONSHIP"]
    for t in sources:
        df = to_df(sheets[t])
        schema, bare = (t.split(".") if "." in t else ("cerner", t))
        fn = outdir / f"{schema.lower()}_{bare.lower()}.parquet"
        df.to_parquet(fn, index=False, coerce_timestamps='us', allow_truncated_timestamps=True)
        print(fn, df.shape, list(df.columns))
    for t in ["OMOP.PERSON", "OMOP.VISIT_OCCURRENCE", "OMOP.CONDITION_OCCURRENCE",
              "OMOP.LOCATION"]:
        df = to_df(sheets[t])
        fn = outdir / f"expected_{t.split('.')[-1].lower()}.parquet"
        df.to_parquet(fn, index=False, coerce_timestamps='us', allow_truncated_timestamps=True)
        print(fn, df.shape, list(df.columns))
    for t in ["FACILITY_POSTCODE", "PERSON_ETHNICITY_CONCEPT"]:
        df = pd.read_csv(f"/root/reference/external/{t}.csv")
        df.columns = [c.split(".")[-1].lower() for c in df.columns]
        fn = outdir / f"external_{t.lower()}.parquet"
        df.to_parquet(fn, index=False, coerce_timestamps='us', allow_truncated_timestamps=True)
        print(fn, df.shape, list(df.columns))


if __name__ == "__main__":
    main()
