"""Every rows-only registry query must carry a quantified error band
(r7 VERDICT item #6): APPROX_BANDS keys == the no-oracle set, and each
band evaluates within its tolerance on the test corpus."""

from __future__ import annotations

from calorista_spark.approx_bands import APPROX_BANDS, TOLERANCE
from calorista_spark.queries import ORACLES, QUERIES


def test_bands_cover_exactly_the_rows_only_set():
    rows_only = {n for n in QUERIES if n not in ORACLES}
    assert set(APPROX_BANDS) == rows_only


def test_every_band_within_tolerance(spark, sf_dir):
    for name, band_fn in sorted(APPROX_BANDS.items()):
        band = band_fn(spark, sf_dir)
        assert set(band) == {
            "metrics",
            "max_rel_err",
            "tolerance",
            "within_tolerance",
        }
        assert band["tolerance"] == TOLERANCE
        assert band["metrics"], name
        assert band["within_tolerance"], (name, band)
