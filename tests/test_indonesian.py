"""IndonesianStemmer (`id/IndonesianStemmer.java:30`, Tala 2003) —
pins mirror the reference's TestIndonesianStemmer vectors."""

from __future__ import annotations

from lucene_solr_spark.analysis.id import (indonesian_analyzer,
                                           indonesian_stem)

PINS = [
    # particles + possessives
    ("bukunya", "buku"), ("bukukah", "buku"), ("bukumu", "buku"),
    # first-order prefixes with sound changes
    ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
    ("membaca", "baca"), ("merusak", "rusak"),
    ("pengukur", "ukur"), ("penyapu", "sapu"), ("penulis", "tulis"),
    ("pembaca", "baca"), ("diukur", "ukur"), ("tertangkap", "tangkap"),
    ("kekasih", "kasih"),
    # second-order prefixes
    ("berlari", "lari"), ("belajar", "ajar"), ("bekerja", "kerja"),
    ("perjelas", "jelas"), ("pelajar", "ajar"), ("pekerja", "kerja"),
    # prefix→suffix chains with the disallowed-combination table
    ("mengukurkan", "ukur"), ("dibukukannya", "buku"),
    # -i guarded after ber- (berlari keeps its i), -si never strips
    ("mengurusi", "urusi"),   # -si never strips
    ("mengikuti", "ikut"),
    # ≤2 syllables: untouched
    ("buku", "buku"), ("di", "di"),
]


def test_indonesian_stem_pins():
    for raw, want in PINS:
        assert indonesian_stem(raw) == want, raw


def test_inflectional_only_mode():
    assert indonesian_stem("bukunya", stem_derivational=False) == "buku"
    assert indonesian_stem("mengukur", stem_derivational=False) == "mengukur"


def test_chain():
    an = indonesian_analyzer(stop_words=["dan"])
    tp = an.term_positions("Mengukur dan diukur")
    assert set(tp.keys()) == {"ukur"} and tp["ukur"] == [0, 2]
