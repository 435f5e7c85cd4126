#!/usr/bin/env python3
"""Golden extraction fixture: run the reference's extractor regexes
(/root/reference/spiderfetch/spider.py:34-57) over its embedded testcases
doc (spider.py:15-32) and emit (a) the doc as a span table and (b) the
expected findall + unique sequences. Output is committed test data."""
import json, re, sys, os

sys.path.insert(0, "/root/reference")
# import only the regex constants without ansicolor side effects:
src = open("/root/reference/spiderfetch/spider.py").read()

testcases = """\
<a href="http://1host/path">
<a href="http://2host/path" >
<a href='http://3host/path' >
<a href'http://4host/path' >
< href"http://5host/path" >
< href=http://6host/path >
<a href=`http://7host/path`>
<a href="http://8host/p\\"ath">
<a href="http://9host/path"att">
<a href="http://10host/p'ath">
<a href="http://11
host/path">
<a href="http://12
 host/path">
<a href=13file.path>
<a href= 14file.pat h >
"""

def rx(name):
    m = re.search(r"_%s = \"\"\"(.*?)\"\"\"" % name, src, re.S)
    return re.compile(m.group(1))

extractors = [
    ("link", rx("link")), ("link_unq", rx("link_unq")),
    ("frame", rx("frame")), ("frame_unq", rx("frame_unq")),
    ("img", rx("img")), ("img_unq", rx("img_unq")),
    ("uri", rx("uri_match")),
]
MEDIA = {"frame", "frame_unq", "img", "img_unq"}

spans = []       # span table rows
findall = []     # expected findall order: (kind, url)
for kind, r in extractors:
    for m in r.finditer(testcases):
        url = m.group("url")
        findall.append({"kind": kind, "url": url})
        spans.append({
            "kind": kind,
            "text": "" if kind in MEDIA else url,
            "media_ref": url if kind in MEDIA else "",
            "offset": m.start("url")})

# span array in document order (offset, then extractor rank for ties)
rank = {k: i for i, (k, _) in enumerate(extractors)}
spans_doc_order = sorted(spans, key=lambda s: (s["offset"], rank[s["kind"]]))

seen, uniq = set(), []
for f in findall:
    if f["url"] not in seen:
        seen.add(f["url"])
        uniq.append(f["url"])

out = {
    "doc_id": "http://testcases.example/page",
    "spans": spans_doc_order,
    "expected_findall": findall,
    "expected_unique": uniq,
}
path = os.path.join(os.path.dirname(__file__), "..",
                    "src", "test", "resources", "spider_testcases.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("findall count:", len(findall), " unique count:", len(uniq))
for f in findall: print(" ", f["kind"], repr(f["url"]))
