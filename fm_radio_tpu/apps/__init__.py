"""CLI applications mirroring the reference's executable suite
(``fm_demod_no_tuner``, ``fm_demod_scraper``, ``fm_demod_benchmark``,
``rds_decode``) plus tap-point dumping in place of the GUI."""
