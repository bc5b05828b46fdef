"""Generate markdown byte-parity goldens from the reference html2text fork.

Run:  python scripts/gen_markdown_goldens.py

Loads /root/reference/crawl4ai/html2text standalone (stdlib-only) plus the
reference's convert_links_to_citations (extracted by AST so its heavy module
imports are skipped), renders every fixture with the exact defaults
DefaultMarkdownGenerator applies (markdown_generation_strategy.py:181-214),
and writes tests/goldens/markdown/<name>.{html,md,cited.md,refs.md}.

The pytest suite (tests/test_markdown_golden.py) then byte-compares our
crawl4ai_spark.html.markdown output against these files WITHOUT importing the
reference — the goldens are the frozen oracle.
"""

from __future__ import annotations

import ast
import importlib.util
import pathlib
import re
import sys
from urllib.parse import urljoin

REF = pathlib.Path("/root/reference/crawl4ai")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "markdown"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def load_ref_html2text():
    spec = importlib.util.spec_from_file_location(
        "ref_html2text", REF / "html2text" / "__init__.py",
        submodule_search_locations=[str(REF / "html2text")])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_html2text"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_citations():
    """Exec just LINK_PATTERN, fast_urljoin and convert_links_to_citations
    out of the reference strategy module (its top-level imports need lxml/bs4
    which this sandbox lacks)."""
    src = (REF / "markdown_generation_strategy.py").read_text()
    tree = ast.parse(src)
    keep = []
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "LINK_PATTERN" for t in node.targets
        ):
            keep.append(node)
        elif isinstance(node, ast.FunctionDef) and node.name == "fast_urljoin":
            keep.append(node)
        elif isinstance(node, ast.ClassDef) and node.name == "DefaultMarkdownGenerator":
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == "convert_links_to_citations":
                    keep.append(sub)
    ns = {"re": re, "urljoin": urljoin}
    exec(compile(ast.Module(body=keep, type_ignores=[]), "<ref-citations>", "exec"), ns)
    fn = ns["convert_links_to_citations"]
    return lambda markdown, base_url="": fn(None, markdown, base_url)


def reference_markdown(mod, html: str, base_url: str = "") -> str:
    h = mod.CustomHTML2Text(baseurl=base_url)
    h.update_params(**{
        "body_width": 0, "ignore_emphasis": False, "ignore_links": False,
        "ignore_images": False, "protect_links": False,
        "single_line_break": True, "mark_code": True, "escape_snob": False,
    })
    try:
        raw = h.handle(html)
    except Exception as e:  # mirror generate_markdown's failure capture
        raw = f"Error converting HTML to markdown: {str(e)}"
    return raw.replace("    ```", "```")


# --------------------------------------------------------------------------
# fixture corpus
# --------------------------------------------------------------------------

def feature_fixtures() -> dict[str, tuple[str, str]]:
    """Handcrafted pages, one per behavior family. (name -> (html, base_url))"""
    B = "https://fix.example.com/dir/page.html"
    f: dict[str, tuple[str, str]] = {}
    f["headings"] = ("<h1>One</h1><h2>Two &amp; half</h2><h3>Three</h3>"
                     "<h4>IV</h4><h5>v</h5><h6>vi</h6><p>after</p>", B)
    f["paragraphs"] = ("<p>first para</p><p>second   para\nwith\twhitespace</p>"
                       "<div>a div block</div><p></p><p>last</p>", B)
    f["emphasis"] = ("<p>a <em>em</em> b <strong>bold</strong> c <i>it</i> "
                     "<b>bb</b> <u>und</u>MID<em>tight</em>after "
                     "wo<strong>rd</strong>break <del>gone</del> <s>also</s></p>", B)
    f["emphasis_edge"] = ("<p>x<em> lead space</em> and <strong>trail </strong>y "
                          "**<strong>star</strong> ~<del>tilde</del> <em></em>empty</p>", B)
    f["links_inline"] = ('<p>see <a href="/p1">rel link</a>, '
                         '<a href="https://other.example/x" title="The Title">titled</a>, '
                         '<a href="#frag">internal</a>, '
                         '<a href="mailto:a@b.c">mail</a>, '
                         '<a>no href</a> end</p>', B)
    f["links_auto"] = ('<p><a href="https://abs.example/x">https://abs.example/x</a> '
                       'and <a href="/rel">/rel</a> '
                       'and <a href="https://abs.example/y">text diff</a></p>', B)
    f["links_nested"] = ('<p><a href="/a"><strong>bold link</strong></a> '
                         '<a href="/b"><img src="i.png" alt="al"></a> '
                         '<a href="/c"></a> '
                         '<a href="/d"><code>codey</code></a></p>', B)
    f["links_heading"] = ('<a href="/h"><h2>Heading In Link</h2></a><p>after</p>', B)
    f["images"] = ('<p><img src="a.jpg" alt="Alt [text]"> '
                   '<img src="b.png"> <img alt="no src"> '
                   '<img src="c.gif" alt="with (parens)"></p>', B)
    f["lists_ul"] = ("<ul><li>alpha</li><li>beta</li><li>gamma</li></ul><p>after</p>", B)
    f["lists_nested"] = ("<ul><li>a<ul><li>a1</li><li>a2</li></ul></li>"
                         "<li>b<ol><li>b1</li></ol></li></ul>", B)
    f["lists_ol"] = ('<ol><li>one</li><li>two</li></ol>'
                     '<ol start="5"><li>five</li><li>six</li></ol>', B)
    f["lists_ol_ul"] = ("<ol><li>o1<ul><li>inner ul</li></ul></li><li>o2</li></ol>", B)
    f["lists_rich"] = ('<ul><li><strong>bold</strong> item with <a href="/x">link</a>'
                       '</li><li><p>para in li</p></li></ul>', B)
    f["table_th"] = ("<table><tr><th>key</th><th>value</th></tr>"
                     "<tr><td>k1</td><td>v1</td></tr>"
                     "<tr><td>k2</td><td>v2</td></tr></table><p>after</p>", B)
    f["table_td_only"] = ("<table><tr><td>a</td><td>b</td><td>c</td></tr>"
                          "<tr><td>1</td><td>2</td><td>3</td></tr></table>", B)
    f["table_caption"] = ("<table><caption>cap text</caption><thead><tr><th>h</th>"
                          "</tr></thead><tbody><tr><td>d</td></tr></tbody></table>", B)
    f["table_links"] = ('<table><tr><th>site</th></tr><tr><td>'
                        '<a href="https://e.com/">e</a></td></tr></table>', B)
    f["pre_code"] = ("<pre><code>def f(x):\n    return x * 2\n</code></pre><p>after</p>", B)
    f["pre_plain"] = ("<pre>plain  pre\n  spaced\n</pre>", B)
    f["pre_entities"] = ("<pre><code>if a &lt; b &amp;&amp; c:\n    pass</code></pre>", B)
    f["code_inline"] = ("<p>run <code>pip install x</code> then <code>multi\nline</code> "
                        "and <kbd>Ctrl</kbd> and <tt>tty</tt></p>", B)
    f["blockquote"] = ("<blockquote><p>quoted para</p><p>second</p></blockquote><p>after</p>", B)
    f["blockquote_nested"] = ("<blockquote><p>outer</p><blockquote><p>inner</p>"
                              "</blockquote><p>back</p></blockquote>", B)
    f["blockquote_br"] = ("<blockquote><p>line one<br>line two</p></blockquote>", B)
    f["br_hr"] = ("<p>above<br>below</p><hr><p>end</p>", B)
    f["entities"] = ("<p>&amp; &lt; &gt; &quot; &nbsp; &rsquo;s &ldquo;q&rdquo; "
                     "&mdash; &ndash; &copy; &eacute; &unknown; &#169; &#x27; &#8212;</p>", B)
    f["escaping"] = ("<p>back\\slash 1. dotted +plus -dash *star _under [brack]</p>", B)
    f["head_script"] = ("<html><head><title>T</title><style>p{color:red}</style>"
                        "<script>var x=1;</script></head><body><p>visible</p>"
                        "<script>hidden()</script><p>tail</p></body></html>", B)
    f["q_abbr"] = ('<p>He said <q>hi there</q> to the '
                   '<abbr title="World Health Organization">WHO</abbr> team</p>', B)
    f["dl"] = ("<dl><dt>term one</dt><dd>def one</dd><dt>term two</dt><dd>def two</dd></dl>", B)
    f["soup_unclosed"] = ("<div><p>one para<div>nested unclosed<p>two<ul><li>item", B)
    f["soup_stray_close"] = ("</p>stray<p>ok</p></div></ul>text after", B)
    f["soup_mixed_case"] = ("<P>Upper <EM>Case</EM> <A HREF='/X'>Tags</A></P>", B)
    f["soup_attrs"] = ('<p class=unquoted data-x="1">attr soup '
                       '<a href="/a" href="/b">dup href</a></p>', B)
    f["empty"] = ("", B)
    f["text_only"] = ("just bare text, no tags", B)
    f["pre_in_list"] = ("<ul><li>step one<pre>indented code\n  line2</pre>"
                        "</li><li>step two</li></ul>", B)
    f["pre_fence_replace"] = ("<div>    <pre>x</pre></div>"
                              "<p>text    before</p><pre>in\n    dent</pre>", B)
    f["list_in_blockquote"] = ("<blockquote><p>quote</p><ul><li>a</li>"
                               "<li>b</li></ul></blockquote>", B)
    f["dl_in_list"] = ("<ul><li>item<dl><dt>t</dt><dd>d</dd></dl></li></ul>", B)
    f["ol_start_zero"] = ('<ol start="0"><li>zero</li><li>one</li></ol>'
                          '<ol start="x"><li>bad start</li></ol>', B)
    f["abbr_multi"] = ('<p><abbr title="Hypertext Markup Language">HTML</abbr> and '
                       '<abbr>no title</abbr> and '
                       '<abbr title="Cascading Style Sheets">CSS</abbr></p>', B)
    f["del_q_nested"] = ('<p>a <del>gone <em>nested</em></del> '
                         '<q>outer <q>inner</q> close</q> end</p>', B)
    f["img_title_in_link"] = ('<p><a href="/t"><img src="i.png" alt="a" '
                              'title="imgtitle"></a>'
                              '<a href="/u" title="lt"><img src="j.png"></a></p>', B)
    f["autolink_edges"] = ('<p><a href="https://x.example/">https://x.example/</a> '
                           '<a href="HTTPS://x.example/">HTTPS://x.example/</a> '
                           '<a href="https://x.example/">https://x.example</a></p>', B)
    f["code_edge"] = ('<p><code></code>empty <code>a`b</code> tick '
                      '<kbd>K</kbd>after<tt>T</tt></p>', B)
    f["heading_in_link_deep"] = ('<a href="/h"><h3>Linked <em>Head</em></h3></a>'
                                 '<a href="/i">pre<h4>after text</h4></a>', B)
    f["entities_numeric"] = ("<p>&#x41;&#66; &#160;sep &#8217;q &#x2014;dash "
                             "&#999999999; &#xd; tail</p>", B)
    f["whitespace_runs"] = ("<p>   lead  and\n\n\ninner\t\truns   </p>"
                            "<p> literal nbsp char </p>", B)
    f["table_rowspan_mess"] = ('<table><tr><th colspan="2">wide</th></tr>'
                               '<tr><td>a</td><td>b</td><td>c</td></tr>'
                               '<tr></tr><tr><td>solo</td></tr></table>', B)
    f["br_in_table"] = ("<table><tr><td>line<br>break</td><td>x</td></tr></table>", B)
    f["hr_variants"] = ("<p>a</p><hr/><p>b</p><hr><hr><p>c</p>", B)
    f["strong_em_mix"] = ("<p><strong><em>both</em></strong> "
                          "<em><strong>swap</strong></em> "
                          "<strong>out <em>in</em> side</strong></p>", B)
    f["form_select"] = ('<form action="/s"><label>Q</label>'
                        '<input type="text" name="q" value="v">'
                        '<select><option>one</option><option selected>two</option>'
                        '</select><button>Go</button></form><p>after</p>', B)
    f["figure_caption"] = ('<figure><img src="f.png" alt="fig">'
                           '<figcaption>The caption</figcaption></figure>', B)
    f["details_summary"] = ("<details><summary>More</summary>"
                            "<p>hidden body</p></details>", B)
    f["video_audio"] = ('<video src="v.mp4" controls>fallback text</video>'
                        '<audio src="a.mp3"></audio><p>after media</p>', B)
    f["nav_aside"] = ('<nav><a href="/1">one</a> <a href="/2">two</a></nav>'
                      '<aside><p>sidebar note</p></aside><main><p>main</p></main>', B)
    f["iframe_embed"] = ('<p>before</p><iframe src="https://e.example/x">'
                         'no frames</iframe><p>after</p>', B)
    f["svg_math"] = ('<p>a</p><svg><circle r="1"/><text>svg text</text></svg>'
                     '<math><mi>x</mi></math><p>b</p>', B)
    f["spans_classes"] = ('<p><span class="a">one</span><span> two</span>'
                          '<small>fine</small><mark>hi</mark>'
                          '<sub>s</sub><sup>p</sup></p>', B)
    f["unicode"] = ("<p>caf\u00e9 \u2014 na\u00efve \u6f22\u5b57 \U0001f600</p>", B)
    f["base_rel"] = ('<p><a href="../up">up</a> <a href="sib">sib</a> '
                     '<a href="//proto.example/p">proto-rel</a> '
                     '<img src="../img.png" alt="i"></p>', "https://base.example/a/b/c.html")
    return f


def soup_fixtures() -> dict[str, tuple[str, str]]:
    """Deterministic pseudo-random tag soup (hits parser-tolerance paths)."""
    import random
    rng = random.Random(20260817)
    tags = ["p", "div", "em", "strong", "ul", "li", "a", "span", "h2", "table",
            "tr", "td", "pre", "code", "blockquote", "br", "img"]
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "alpha", "beta", "42",
             "&amp;", "&rsquo;", "x*y", "[z]", "a_b"]
    out = {}
    for i in range(40):
        parts = []
        for _ in range(rng.randint(10, 40)):
            r = rng.random()
            t = rng.choice(tags)
            if r < 0.35:
                attr = ' href="/s%d"' % rng.randint(0, 9) if t == "a" else (
                    ' src="s%d.png"' % rng.randint(0, 9) if t == "img" else "")
                parts.append(f"<{t}{attr}>")
            elif r < 0.55:
                parts.append(f"</{t}>")
            else:
                parts.append(" ".join(rng.choice(words) for _ in range(rng.randint(1, 6))))
        out[f"soup_rand_{i:02d}"] = ("".join(parts), "https://soup.example/")
    return out


def pagesgen_fixtures() -> dict[str, tuple[str, str]]:
    """Synthetic corpus pages (raw html AND the scraper's cleaned_html)."""
    from crawl4ai_spark.sources.pagesgen import build_html, page_url
    from crawl4ai_spark.html.scraper import scrape

    out = {}
    for h in range(3):
        for p in range(8):
            url = page_url(h, p)
            html = build_html(h, p, 3, 31)
            out[f"page_h{h}p{p}_raw"] = (html, url)
            try:
                cleaned = scrape(url, html)["cleaned_html"]
                out[f"page_h{h}p{p}_clean"] = (cleaned, url)
            except Exception:
                pass
    return out


def main() -> None:
    mod = load_ref_html2text()
    cite = load_ref_citations()
    OUT.mkdir(parents=True, exist_ok=True)
    fixtures = {}
    fixtures.update(feature_fixtures())
    fixtures.update(soup_fixtures())
    fixtures.update(pagesgen_fixtures())
    n = 0
    for name, (html, base) in sorted(fixtures.items()):
        raw = reference_markdown(mod, html, base)
        try:
            cited, refs = cite(raw, base)
        except Exception as e:
            cited, refs = raw, f"Error generating citations: {str(e)}"
        (OUT / f"{name}.html").write_text(html)
        (OUT / f"{name}.base").write_text(base)
        (OUT / f"{name}.md").write_text(raw)
        (OUT / f"{name}.cited.md").write_text(cited)
        (OUT / f"{name}.refs.md").write_text(refs)
        n += 1
    print(f"wrote {n} golden fixtures to {OUT}")


if __name__ == "__main__":
    main()
