"""SweetSpotSimilarity unit conformance (misc module role)."""
def test_sweetspot_length_norm_plateau():
    """Inside [ln_min, ln_max] the norm is exactly 1; outside it decays
    symmetrically (SweetSpotSimilarity.computeLengthNorm)."""
    import numpy as np
    import pytest
    from lucene_ray.search.similarities import SweetSpotSimilarity
    s = SweetSpotSimilarity(ln_min=10, ln_max=20, ln_steep=0.5,
                            tf_base=1.0)
    freqs = np.array([1, 1, 1, 1, 1])
    dl = np.array([10, 15, 20, 5, 25])
    got = s.term_score(freqs, dl, df=3, ttf=10, boost=1.0,
                       doc_count=100, sum_ttf=1000)
    idf = np.log(101 / 4.0) + 1.0
    tf = np.sqrt(2.0)
    assert got[0] == got[1] == got[2] == idf * tf  # plateau
    assert got[3] == got[4] < got[0]  # symmetric decay
    want_out = idf * tf / np.sqrt(0.5 * (5 + 5) + 1.0)
    assert got[3] == pytest.approx(want_out, rel=1e-12)
    # zero freq scores zero; freq <= tf_min takes tf_base
    s2 = SweetSpotSimilarity(tf_base=2.0, tf_min=3.0)
    got2 = s2.term_score(np.array([0, 2, 9]), np.array([1, 1, 1]),
                         3, 10, 1.0, 100, 1000)
    assert got2[0] == 0.0
    assert got2[1] / got2[2] == pytest.approx(
        2.0 / np.sqrt(9 + 4 - 3), rel=1e-12)
