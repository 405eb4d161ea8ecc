

def test_business_days_formula_matches_brute_force():
    # The GREATEST/LEAST closed form must equal a literal day walk
    # (Monday=0 numbering, business days in [d0, d1)).
    def closed(d0, d1):
        dow0 = (d0 + 4) % 7
        span = d1 - d0
        rem = span % 7
        return (
            5 * (span // 7)
            + min(rem, max(0, 5 - dow0))
            + max(0, rem - (7 - dow0))
        )

    def brute(d0, d1):
        return sum(1 for d in range(d0, d1) if (d + 4) % 7 < 5)

    for d0 in range(9700, 9750):
        for span in range(0, 45):
            assert closed(d0, d0 + span) == brute(d0, d0 + span)
