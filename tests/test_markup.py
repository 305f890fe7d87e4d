"""Markup toolkit tests (modeled on the reference's in-isolate environment
suite, test/test-workers-javascript-environment.js:24-118)."""

from __future__ import annotations

from pigeon_optics_spark.lens import LensHarness, PathInfo
from pigeon_optics_spark.markup import Markup, select

DOC = ["html",
       ["body", {"class": "main dark"},
        ["div", {"id": "top", "class": "box"},
         ["p", "first ", ["b", "bold"], " text"],
         ["p", {"class": "note"}, "second"]],
        ["div", {"class": "box"},
         ["span", {"data-x": "1"}, "third"]]]]


def test_select_by_tag():
    assert [Markup.get.text(n) for n in select(DOC, "p")] == [
        "first bold text", "second"]


def test_select_by_id_and_class():
    assert select(DOC, "#top")[0][1]["id"] == "top"
    assert len(select(DOC, ".box")) == 2
    assert Markup.get.text(select(DOC, "p.note")[0]) == "second"
    assert len(select(DOC, ".main")) == 1  # multi-class attr matches each


def test_select_attribute():
    assert Markup.get.text(select(DOC, "[data-x]")[0]) == "third"
    assert select(DOC, '[data-x="1"]') and not select(DOC, '[data-x="2"]')


def test_select_descendant_and_child():
    assert len(select(DOC, "#top p")) == 2
    assert len(select(DOC, "body > div")) == 2
    assert len(select(DOC, "body > p")) == 0
    assert [n[0] for n in select(DOC, "#top b")] == ["b"]


def test_select_groups_and_star():
    assert len(select(DOC, "b, span")) == 2
    assert len(select(DOC, "div *")) == 4  # p, b, p, span


def test_get_set_serialize():
    node = ["p", {"class": "note"}, "second"]
    assert Markup.get.attribute(node, "class") == "note"
    assert Markup.get.tag(node) == "p"
    Markup.set.attribute(node, "class", "edited")
    assert node[1]["class"] == "edited"
    bare = ["i", "x"]
    Markup.set.attribute(bare, "a", "b")
    assert bare == ["i", {"a": "b"}, "x"]
    assert Markup.toXML(["r", {"a": "1"}, "t"]) == '<r a="1">t</r>'
    assert Markup.toHTML(["img", {"src": "x"}]) == '<img src="x">'
    assert Markup.isPigeonMark(DOC) and not Markup.isPigeonMark({"a": 1})


def test_markup_available_in_lens_code():
    code = (
        "for p in Markup.select(data, 'p'):\n"
        "    output(Markup.get.text(p), 1)\n"
    )
    harness = LensHarness(code)
    pinfo = PathInfo(string="/datasets/a:d/records/r", source="datasets",
                     author="a", name="d", recordID="r")
    outputs, logs, errors = harness.run(pinfo, DOC)
    assert errors == []
    assert [(oid, v) for _i, oid, v in outputs] == [
        ("first bold text", 1), ("second", 1)]


def test_markup_walkers_handle_deep_trees():
    """Iterative walkers: a deeply nested JsonML value must not blow the
    recursion limit inside the lens sandbox (the codec nesting-bomb
    discipline; review finding)."""
    from pigeon_optics_spark.markup import Markup, select

    deep = ["leaf", "x"]
    for _ in range(5000):
        deep = ["a", deep]
    found = select(deep, "leaf")
    assert len(found) == 1 and found[0] == ["leaf", "x"]
    assert Markup.get.text(deep) == "x"
    # multi-step chain over the deep tree (parent map path)
    assert len(select(deep, "a leaf")) == 1
    assert len(select(deep, "a > leaf")) == 1
