"""Raw-dump converter tests (utils/convert.py) — capability parity with
the reference's vendored RecBole conversion tool
(util/knowledge/conversion_tools/src/extended_dataset.py), exercised on
tiny synthetic raw dumps in each dataset's actual on-disk format."""

import json
import os

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.data.io import load_data_set
from hypergraph_diffusion_for_recommendation_tpu.utils.convert import (
    atomic_to_ratings,
    convert_dataset,
    kcore_filter,
    read_atomic,
    write_atomic,
)


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fp:
        fp.write(text)


def test_atomic_roundtrip(tmp_path):
    path = str(tmp_path / "x.inter")
    rows = [["u1", "i1", "4.0"], ["u2", "i2", "2.5"]]
    n = write_atomic(path, ["user_id:token", "item_id:token", "rating:float"], rows)
    assert n == 2
    header, got = read_atomic(path)
    assert header == ["user_id:token", "item_id:token", "rating:float"]
    assert got == rows


def test_atomic_rejects_bad_fields(tmp_path):
    with pytest.raises(ValueError):
        write_atomic(str(tmp_path / "x.inter"), ["user_id:int64"], [])
    with pytest.raises(ValueError):
        write_atomic(
            str(tmp_path / "y.inter"), ["user_id:token", "item_id:token"], [["u"]]
        )


def test_ml1m(tmp_path):
    raw = str(tmp_path / "raw")
    _write(
        raw + "/ratings.dat",
        "1::1193::5::978300760\n1::661::3::978302109\n2::1193::4::978298413\n",
    )
    _write(
        raw + "/movies.dat",
        "1193::One Flew Over the Cuckoo's Nest (1975)::Drama\n"
        "661::James and the Giant Peach (1996)::Animation|Children's|Musical\n",
    )
    _write(raw + "/users.dat", "1::F::1::10::48067\n2::M::56::16::70072\n")
    out = convert_dataset("ml-1m", raw, str(tmp_path / "out"))
    header, rows = read_atomic(out["inter"][0])
    assert rows[0] == ["1", "1193", "5", "978300760"]
    _, items = read_atomic(out["item"][0])
    # title/year split + genre | -> space (reference ML1MDataset behavior)
    assert items[0] == ["1193", "One Flew Over the Cuckoo's Nest", "1975", "Drama"]
    assert items[1][3] == "Animation Children's Musical"
    _, users = read_atomic(out["user"][0])
    assert users[0] == ["1", "F", "1", "10", "48067"]
    # training export readable by the framework loader (header skipped,
    # int64 raw ids)
    pairs = load_data_set(out["ratings"][0])
    assert pairs.shape[0] == 3
    assert {(int(u), int(i)) for u, i in pairs[:, :2]} == {
        (1, 1193), (1, 661), (2, 1193)}


def test_lastfm_hetrec(tmp_path):
    raw = str(tmp_path / "raw")
    _write(
        raw + "/user_artists.dat",
        "userID\tartistID\tweight\n2\t51\t13883\n2\t52\t11690\n3\t51\t100\n",
    )
    _write(raw + "/artists.dat", "id\tname\turl\n51\tDuran Duran\thttp://x\n")
    out = convert_dataset("lastfm", raw, str(tmp_path / "out"))
    header, rows = read_atomic(out["inter"][0])
    assert header[0] == "user_id:token" and rows[0] == ["2", "51", "13883"]
    _, items = read_atomic(out["item"][0])
    assert items[0] == ["51", "Duran Duran"]
    assert out["ratings"][1] == 3


def test_amazon_books(tmp_path):
    raw = str(tmp_path / "raw")
    _write(
        raw + "/ratings_Books.csv",
        "A1\tnope".replace("\t", "") + "\n",  # malformed line skipped
    )
    _write(
        raw + "/ratings_Books.csv",
        "A1,0001,5.0,1362268800\nA2,0001,1.0,1362268801\nA1,0002,4.0,2\n",
    )
    out = convert_dataset("amazon-books", raw, str(tmp_path / "out"),
                          min_rating=4.0)
    assert out["inter"][1] == 3
    # min_rating drops the 1.0 row from the training export only
    assert out["ratings"][1] == 2


def test_yelp(tmp_path):
    raw = str(tmp_path / "raw")
    recs = [
        {"review_id": "r1", "user_id": "uA", "business_id": "b1", "stars": 5.0,
         "date": "2016-01-01"},
        {"review_id": "r2", "user_id": "uB", "business_id": "b2", "stars": 3.0,
         "date": "2016-01-02"},
    ]
    _write(raw + "/yelp_academic_dataset_review.json",
           "\n".join(json.dumps(r) for r in recs) + "\n")
    out = convert_dataset("yelp", raw, str(tmp_path / "out"))
    _, rows = read_atomic(out["inter"][0])
    assert rows[0] == ["uA", "b1", "5.0", "2016-01-01"]
    assert out["ratings"][1] == 2
    # hash ids remapped to dense ints + sidecar maps; loader-readable
    assert os.path.exists(out["ratings"][0] + ".user_map")
    assert os.path.exists(out["ratings"][0] + ".item_map")
    pairs = load_data_set(out["ratings"][0])
    assert {(int(u), int(i)) for u, i in pairs[:, :2]} == {(0, 0), (1, 1)}


def test_steam_python_literal_lines(tmp_path):
    raw = str(tmp_path / "raw")
    # raw steam dump lines are single-quoted python literals, not JSON
    _write(
        raw + "/steam_reviews.json",
        "{'username': 'alice', 'product_id': '10', 'hours': 12.5, "
        "'date': '2015-01-01'}\n"
        "{'username': 'bob', 'product_id': '20', 'hours': 1.0}\n"
        "not a record\n",
    )
    out = convert_dataset("steam", raw, str(tmp_path / "out"))
    _, rows = read_atomic(out["inter"][0])
    assert rows == [
        ["alice", "10", "12.5", "2015-01-01"],
        ["bob", "20", "1.0", ""],
    ]


def test_kcore_and_dedup(tmp_path):
    # u1 has 3 edges, u2 has 1; i1 touched by both. 2-core keeps only the
    # subgraph where every user AND item has >= 2 edges.
    pairs = [("u1", "i1"), ("u1", "i2"), ("u1", "i3"), ("u2", "i1"),
             ("u3", "i1"), ("u3", "i2")]
    kept = kcore_filter(pairs, 2)
    assert ("u2", "i1") not in kept
    assert set(kept) == {("u1", "i1"), ("u1", "i2"), ("u3", "i1"), ("u3", "i2")}

    path = str(tmp_path / "d.inter")
    write_atomic(
        path,
        ["user_id:token", "item_id:token", "rating:float"],
        [["u", "i", "5"], ["u", "i", "3"], ["v", "j", "4"]],
    )
    outp = str(tmp_path / "ratings.txt")
    assert atomic_to_ratings(path, outp) == 2  # duplicate (u,i) dropped


def test_converted_output_feeds_kg_subset(tmp_path):
    """End-to-end: raw lastfm dump -> ratings.txt -> make_kg_subset link/kg
    (the reference's add_knowledge.py pipeline, one command each)."""
    from hypergraph_diffusion_for_recommendation_tpu.utils.dataset_tools import (
        make_kg_subset,
    )

    raw = str(tmp_path / "raw")
    _write(raw + "/user_artists.dat",
           "userID\tartistID\tweight\n2\t51\t10\n3\t52\t5\n")
    out = convert_dataset("lastfm", raw, str(tmp_path / "out"))
    _write(str(tmp_path / "link.kg"), "51\te.51\n52\te.52\n99\te.99\n")
    _write(str(tmp_path / "full.kg"),
           "e.51\tgenre\te.rock\ne.99\tgenre\te.pop\ne.rock\tera\te.80s\n")
    n_links, n_triples = make_kg_subset(
        out["ratings"][0], str(tmp_path / "full.kg"), str(tmp_path / "link.kg"),
        str(tmp_path / "sub"), hop=2,
    )
    assert n_links == 2  # item 99 not interacted with
    with open(str(tmp_path / "sub") + ".kg") as fp:
        triples = fp.read().splitlines()
    assert "e.51\tgenre\te.rock" in triples
    assert "e.rock\tera\te.80s" in triples  # hop 2
    assert "e.99\tgenre\te.pop" not in triples
