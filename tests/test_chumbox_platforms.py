"""U4: all 8 chumbox platform definitions (chumbox-handler.ts:17-26),
including adblade's screenshotParentDepth=2 ancestor walk."""

import pytest

from adscraper_spark.extraction.core import extract_page

CASES = [
    # (platform, html) — each wrapped in a detected ad container
    ("adblade",
     '<div class="advert"><div class="adblade-dyna"><div class="w1">'
     '<div class="w2"><a class="description" href="/a">x</a></div></div>'
     "</div></div>"),
    ("contentad",
     '<div class="advert"><div class="ac_container"><a href="/c">y</a>'
     "</div></div>"),
    ("feednetwork",
     '<div class="advert"><div class="my6_item"><a href="/f">z</a>'
     "</div></div>"),
    ("mgid",
     '<div class="advert"><div class="mgline"><a href="/m">m</a>'
     "</div></div>"),
    ("outbrain",
     '<div class="advert"><div class="ob-dynamic-rec-container ob-p">'
     '<a href="/o">o</a></div></div>'),
    ("revcontent",
     '<div class="advert"><div class="rc-item"><a href="/r">r</a>'
     "</div></div>"),
    ("taboola",
     '<div class="advert"><div class="trc_spotlight_item syndicatedItem">'
     '<a href="/t">t</a></div></div>'),
    ("zergnet",
     '<div class="advert"><div class="zergentity"><a href="/z">zz</a>'
     "</div></div>"),
]


@pytest.mark.parametrize("platform,html", CASES)
def test_platform_detected(platform, html):
    res = extract_page("https://h.test/p", f"<body>{html}</body>".encode())
    assert len(res.ads) == 1
    assert res.ads[0].platform == platform
    assert len(res.ads[0].chumbox_parts) == 1


def test_adblade_parent_depth():
    """adblade's screenshot target is the match's 2nd ancestor
    (chumbox-handler.ts definition: screenshotParentDepth=2)."""
    html = CASES[0][1]
    res = extract_page("https://h.test/p", f"<body>{html}</body>".encode())
    part = res.ads[0].chumbox_parts[0]
    # the <a class="description"> is wrapped by w2 then w1: depth-2
    # ancestor is the w1 div
    assert part.startswith('<div class="w1">')


def test_platform_priority_first_match_wins():
    """Definitions are tried in order; the first platform whose selector
    matches takes the ad (chumbox-handler.ts:28-37)."""
    html = ('<div class="advert">'
            '<div class="mgline"><a href="/m">m</a></div>'
            '<div class="zergentity"><a href="/z">z</a></div></div>')
    res = extract_page("https://h.test/p", f"<body>{html}</body>".encode())
    assert res.ads[0].platform == "mgid"  # mgid precedes zergnet