from belb_spark import datagen


def test_deterministic():
    a = datagen.generate(datagen.TINY)
    b = datagen.generate(datagen.TINY)
    for k in a:
        assert a[k].equals(b[k]), k


def test_uid_is_row_number_over_natural_key(tiny_tables):
    r = tiny_tables["repos"]
    assert r["uid"].tolist() == list(range(1, len(r) + 1))
    assert r.sort_values(["repo", "path", "commit"])["uid"].is_monotonic_increasing
    assert not r.duplicated(["repo", "path", "commit"]).any()


def test_gold_covers_all_rows(tiny_tables):
    r, g = tiny_tables["repos"], tiny_tables["gold"]
    assert set(g["uid"]) == set(r["uid"])
    # cluster id is the min uid of its members (canonicalization invariant)
    mins = g.groupby("gold_cluster")["uid"].min()
    assert (mins.index == mins.values).all()


def test_labeled_pairs_well_formed(tiny_tables):
    lp = tiny_tables["labeled_pairs"]
    assert (lp["uid_a"] < lp["uid_b"]).all()
    assert not lp.duplicated(["uid_a", "uid_b", "block_key"]).any()
    assert set(lp["split"]) <= {"train", "dev", "test"}
    assert lp["is_match"].any() and (~lp["is_match"]).any()


def test_history_has_chains_and_obsoletes(tiny_tables):
    h = tiny_tables["history"]
    # obsolete sentinel rows exist (belb OBSOLETE_IDENTIFIER analogue)
    assert (h["new_identifier"] == "-1").any()
    # chain: some new_identifier appears as old_identifier elsewhere
    assert h["new_identifier"].isin(h["old_identifier"]).any()


def test_synonym_dict_unique_and_typed(tiny_tables):
    s = tiny_tables["synonym_dict"]
    assert not s.duplicated(["identifier", "name"]).any()
    assert set(s["description"]) == {0, 1, 2}
