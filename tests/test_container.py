"""Container end-to-end tests — pytest port of the reference's
`ContainerImplTest.java` (shape n=3, p=1/3e6 -> m=94, k=22,
`ContainerImplTest.java:42`), run against every index strategy.

Property extraction = whitespace tokenization; each word is one hashed
dimension (`ContainerImplTest.java:77-85`).
"""

import pytest

from mdbloom.container import INDEX_STRATEGIES, BloomContainer, TokenHasher
from mdbloom.shape import Shape

SHAPE = Shape.from_np(3, 1.0 / 3_000_000)


def hasher(sentence: str) -> TokenHasher:
    return TokenHasher(sentence.split())


def whole(sentence: str) -> TokenHasher:
    """Single-dimension hasher over the whole string (the reference's
    roundTrip test hashes the full sentence as one property,
    `ContainerImplTest.java:47-56`)."""
    return TokenHasher([sentence])


@pytest.fixture(params=sorted(INDEX_STRATEGIES))
def container(request):
    return BloomContainer(SHAPE, index=request.param)


def test_shape_reproduces_reference():
    assert (SHAPE.m, SHAPE.k) == (94, 22)


def test_round_trip(container):
    """`ContainerImplTest.roundTrip` (:47-56)."""
    container.put(whole("Hello World"), "Hello World")
    assert container.get(whole("Hello World")) == ["Hello World"]
    assert container.value_count == 1
    assert container.filter_count == 1


def test_get_with_distractors(container):
    """`ContainerImplTest.getTest` (:64-75)."""
    for s in ["Hello World", "Goodbye Cruel World",
              "Now is the time for all good men to come to the aid of their country"]:
        container.put(whole(s), s)
    assert container.get(whole("Hello World")) == ["Hello World"]
    assert container.value_count == 3


def test_search_word_tokenized(container):
    """`ContainerImplTest.searchTest` (:87-107): word-tokenized sentences;
    get on an absent sentence -> 0; search on one word -> both sentences
    containing it."""
    sentences = ["Hello World", "Spring has Sprung", "GoodBye Cruel World"]
    for s in sentences:
        container.put(hasher(s), s)
    assert container.get(hasher("Just another dog")) == []
    hits = sorted(container.search(TokenHasher(["World"])))
    assert hits == ["GoodBye Cruel World", "Hello World"]
    # subset-of-dimensions query also matches (partial-match semantics)
    assert sorted(container.search(TokenHasher(["Cruel", "World"]))) == \
        ["GoodBye Cruel World"]


def test_remove(container):
    """`ContainerImplTest.removeTest` (:109-132): wrong value is a no-op;
    right value removes."""
    sentences = ["Hello World", "Spring has Sprung", "GoodBye Cruel World"]
    for s in sentences:
        container.put(hasher(s), s)
    container.remove(hasher("Hello World"), "Hello World too")  # no-op
    assert container.value_count == 3
    assert sorted(container.search(TokenHasher(["World"]))) == \
        ["GoodBye Cruel World", "Hello World"]
    container.remove(hasher("Hello World"), "Hello World")
    assert container.value_count == 2
    assert container.filter_count == 2
    assert container.search(TokenHasher(["World"])) == ["GoodBye Cruel World"]
    assert container.get(hasher("Hello World")) == []


def test_empty_search_returns_all(container):
    """Empty hasher matches everything (`ContainerImpl.java:159-169`)."""
    for s in ["a b", "c d", "e f"]:
        container.put(hasher(s), s)
    assert sorted(container.search(TokenHasher([]))) == ["a b", "c d", "e f"]


def test_multi_value_per_filter(container):
    """Storage is a multimap: same dimensions, different values
    (`Container.java:171-177`)."""
    container.put(hasher("same dims"), "v1")
    container.put(hasher("same dims"), "v2")
    assert container.filter_count == 1
    assert container.value_count == 2
    assert sorted(container.get(hasher("same dims"))) == ["v1", "v2"]
    container.remove(hasher("same dims"), "v1")
    assert container.get(hasher("same dims")) == ["v2"]
    assert container.filter_count == 1
    container.remove(hasher("same dims"), "v2")
    assert container.filter_count == 0
    assert container.get(hasher("same dims")) == []


def test_gate_short_circuits_definite_misses(container):
    container.put(hasher("alpha beta"), "x")
    # a miss goes through the gate; correctness is unchanged either way
    assert container.search(TokenHasher(["nonexistent-token-zzz"])) == []
    assert container.get(hasher("something else")) == []


def test_value_and_filter_counts(container):
    """`getValueCount` counts duplicates; `getFilterCount` counts distinct
    filters (`Container.java:38-50`)."""
    container.put(hasher("one two"), "a")
    container.put(hasher("one two"), "b")
    container.put(hasher("three four"), "c")
    assert container.value_count == 3
    assert container.filter_count == 2
