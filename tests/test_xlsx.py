"""Minimal xlsx writer produces a readable workbook (pandas/zip check)."""

import zipfile

from cfpnet_tpu.utils.xlsx import write_xlsx


def test_xlsx_roundtrip(tmp_path):
    path = str(tmp_path / "out.xlsx")
    rows = [["epoch", "rmse", "note"], [0, 0.523, "a"], [1, 0.481, "b"]]
    write_xlsx(path, rows)
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "xl/worksheets/sheet1.xml" in names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        assert "<v>0.481</v>" in sheet and "rmse" in sheet
    try:
        import pandas as pd

        df = pd.read_excel(path)
        assert list(df.columns) == ["epoch", "rmse", "note"]
        assert float(df["rmse"][1]) == 0.481
    except ImportError:
        pass
