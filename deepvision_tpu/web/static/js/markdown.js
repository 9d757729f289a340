/* Minimal markdown renderer (the reference vendors marked.js; offline
   here, so a small purpose-built renderer covers the report subset:
   headings, lists, tables, fenced code, mermaid blocks, blockquotes,
   bold/italic/inline code, links). Output is escaped-first — safe HTML. */
(function () {
  "use strict";

  function esc(s) {
    return s.replace(/&/g, "&amp;").replace(/</g, "&lt;")
      .replace(/>/g, "&gt;").replace(/"/g, "&quot;");
  }

  function inline(s) {
    let out = esc(s);
    out = out.replace(/\x60([^\x60]+)\x60/g, (_, c) => `<code>${c}</code>`);
    out = out.replace(/\*\*([^*]+)\*\*/g, "<strong>$1</strong>");
    out = out.replace(/(^|[^*])\*([^*]+)\*/g, "$1<em>$2</em>");
    out = out.replace(
      /\[([^\]]+)\]\((https?:[^)]+)\)/g,
      '<a href="$2" target="_blank" rel="noopener">$1</a>');
    return out;
  }

  function renderTable(lines, i) {
    const header = lines[i].split("|").filter((c, idx, a) =>
      !(idx === 0 && c.trim() === "") && !(idx === a.length - 1 && c.trim() === ""));
    const rows = [];
    let j = i + 2;
    while (j < lines.length && /^\s*\|/.test(lines[j])) {
      rows.push(lines[j].split("|").filter((c, idx, a) =>
        !(idx === 0 && c.trim() === "") && !(idx === a.length - 1 && c.trim() === "")));
      j++;
    }
    let html = "<table><thead><tr>";
    header.forEach((h) => { html += `<th>${inline(h.trim())}</th>`; });
    html += "</tr></thead><tbody>";
    rows.forEach((r) => {
      html += "<tr>";
      r.forEach((c) => { html += `<td>${inline(c.trim())}</td>`; });
      html += "</tr>";
    });
    html += "</tbody></table>";
    return { html, next: j };
  }

  function render(md) {
    const lines = (md || "").split("\n");
    const out = [];
    let i = 0;
    let listType = null;

    function closeList() {
      if (listType) { out.push(`</${listType}>`); listType = null; }
    }

    while (i < lines.length) {
      const line = lines[i];

      // fenced code
      const fence = line.match(/^\x60{3}(\w*)/);
      if (fence) {
        closeList();
        const lang = fence[1];
        const buf = [];
        i++;
        while (i < lines.length && !/^\x60{3}/.test(lines[i])) { buf.push(lines[i]); i++; }
        i++;
        if (lang === "mermaid" && window.DVMermaid) {
          // render A.3 visualizations to real SVG (reference vendors
          // mermaid.js, web/index.html:225); broken/unsupported source
          // falls back to the styled code block
          const svg = window.DVMermaid.render(buf.join("\n"));
          if (svg) {
            out.push(`<figure class="mermaid-svg">${svg}</figure>`);
            continue;
          }
        }
        const cls = lang === "mermaid" ? ' class="mermaid"' : "";
        out.push(`<pre${cls}><code>${esc(buf.join("\n"))}</code></pre>`);
        continue;
      }
      // table
      if (/^\s*\|/.test(line) && i + 1 < lines.length &&
          /^\s*\|[\s\-:|]+\|?\s*$/.test(lines[i + 1])) {
        closeList();
        const t = renderTable(lines, i);
        out.push(t.html);
        i = t.next;
        continue;
      }
      // heading
      const h = line.match(/^(#{1,4})\s+(.*)/);
      if (h) {
        closeList();
        out.push(`<h${h[1].length}>${inline(h[2])}</h${h[1].length}>`);
        i++;
        continue;
      }
      // blockquote
      if (/^\s*>/.test(line)) {
        closeList();
        out.push(`<blockquote>${inline(line.replace(/^\s*>\s?/, ""))}</blockquote>`);
        i++;
        continue;
      }
      // lists
      const ul = line.match(/^\s*[-*]\s+(.*)/);
      const ol = line.match(/^\s*\d+[.、]\s+(.*)/);
      if (ul || ol) {
        const want = ul ? "ul" : "ol";
        if (listType !== want) { closeList(); out.push(`<${want}>`); listType = want; }
        out.push(`<li>${inline((ul || ol)[1])}</li>`);
        i++;
        continue;
      }
      // horizontal rule
      if (/^\s*---+\s*$/.test(line)) { closeList(); out.push("<hr>"); i++; continue; }
      // blank
      if (!line.trim()) { closeList(); i++; continue; }
      closeList();
      out.push(`<p>${inline(line)}</p>`);
      i++;
    }
    closeList();
    return `<div class="md">${out.join("\n")}</div>`;
  }

  window.DVMarkdown = { render, esc, inline };
})();
