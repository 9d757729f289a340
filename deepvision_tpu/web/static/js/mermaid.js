/* From-scratch mermaid -> SVG renderer for the diagram types the report
   pipeline actually emits (A.3 visualizations: flowchart TD/LR/TB, pie,
   quadrantChart — reference renders these with vendored mermaid.js,
   web/index.html:225 + report_detail_runtime.js:317; offline here, so a
   purpose-built renderer in the spirit of minijs/OOXML).  render(src)
   returns an SVG string or null — callers fall back to the code block. */
(function () {
  "use strict";

  function esc(s) {
    return String(s).replace(/&/g, "&amp;").replace(/</g, "&lt;")
      .replace(/>/g, "&gt;").replace(/"/g, "&quot;");
  }

  /* Label width estimate: CJK chars are full-width (~13px at 13px font),
     ASCII roughly half. */
  function textWidth(s, fs) {
    let w = 0;
    for (let i = 0; i < s.length; i++) {
      w += s.charCodeAt(i) > 0x2e7f ? fs : fs * 0.55;
    }
    return w;
  }

  var PALETTE = ["#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#b07aa1",
                 "#76b7b2", "#edc948", "#9c755f"];

  /* ---------------------------------------------------------------- */
  /* flowchart TD/TB/LR (also legacy `graph`)                          */
  /* ---------------------------------------------------------------- */

  function parseNodeRef(tok, nodes) {
    // ID[label] ID(label) ID((label)) ID[(label)] ID{label} or bare ID
    var m = tok.match(/^\s*([A-Za-z0-9_一-鿿]+)\s*(?:(\(\(|\[\(|\[|\(|\{)(.*?)(\)\)|\)\]|\]|\)|\})\s*)?$/);
    if (!m) return null;
    var id = m[1];
    var shape = "rect";
    var label = id;
    if (m[2]) {
      label = m[3];
      if (m[2] === "((") shape = "circle";
      else if (m[2] === "[(") shape = "cylinder";
      else if (m[2] === "(") shape = "round";
      else if (m[2] === "{") shape = "diamond";
    }
    if (!nodes[id]) nodes[id] = { id: id, label: label, shape: shape };
    else if (m[2]) { nodes[id].label = label; nodes[id].shape = shape; }
    return id;
  }

  function parseFlowchart(src) {
    var lines = src.split("\n");
    var head = lines[0].trim();
    var hm = head.match(/^(?:flowchart|graph)\s+(TD|TB|LR|RL|BT)?/);
    if (!hm) return null;
    var dir = hm[1] || "TD";
    var nodes = {};
    var order = [];
    var edges = [];
    for (var i = 1; i < lines.length; i++) {
      var line = lines[i].trim();
      if (!line || /^%%/.test(line)) continue;
      if (/^(subgraph|end|classDef|class|style|click)\b/.test(line)) continue;
      // normalize the "A -- label --> B" edge-label form to "-->|label|"
      // so one split grammar handles both label syntaxes
      line = line.replace(/--\s+([^-|>][^-]*?)\s+-->/g, "-->|$1| ");
      // split the chain on arrows, keeping labels: A -->|ok| B --> C
      var parts = line.split(/\s*(-{2,3}>|={2,3}>|-\.->|-{3})\s*/);
      if (parts.length === 1) { parseNodeRef(line, nodes); pushOrder(line); continue; }
      var prev = null;
      for (var j = 0; j < parts.length; j += 2) {
        var tok = parts[j];
        var label = "";
        var lm = tok.match(/^\|([^|]*)\|\s*(.*)$/);
        if (lm) { label = lm[1]; tok = lm[2]; }
        var id = parseNodeRef(tok, nodes);
        if (id === null) { prev = null; continue; }
        pushOrder(tok);
        if (prev !== null) edges.push({ from: prev, to: id, label: label });
        prev = id;
      }
    }
    function pushOrder(tok) {
      var m2 = tok.match(/^\s*([A-Za-z0-9_一-鿿]+)/);
      if (m2 && order.indexOf(m2[1]) < 0 && nodes[m2[1]]) order.push(m2[1]);
    }
    // re-scan order (pushOrder was hoisted after use in the loop above)
    if (!order.length) { for (var k in nodes) order.push(k); }
    if (!order.length) return null;
    return { dir: dir, nodes: nodes, order: order, edges: edges };
  }

  function flowchartSvg(g) {
    var FS = 13, PADX = 12, PADY = 8, RANKGAP = 56, NODEGAP = 26;
    // longest-path ranking from sources
    var rank = {};
    var ids = g.order;
    for (var r = 0; r < ids.length; r++) rank[ids[r]] = 0;
    for (var pass = 0; pass < ids.length; pass++) {
      var changed = false;
      for (var e = 0; e < g.edges.length; e++) {
        var ed = g.edges[e];
        if (ed.from === ed.to) continue;
        if (rank[ed.to] < rank[ed.from] + 1 && rank[ed.from] < ids.length) {
          rank[ed.to] = rank[ed.from] + 1;
          changed = true;
        }
      }
      if (!changed) break;
    }
    // group by rank, order by first appearance
    var ranks = [];
    for (var i = 0; i < ids.length; i++) {
      var rr = rank[ids[i]];
      while (ranks.length <= rr) ranks.push([]);
      ranks[rr].push(ids[i]);
    }
    ranks = ranks.filter(function (row) { return row.length > 0; });
    // node geometry
    var geo = {};
    for (var n = 0; n < ids.length; n++) {
      var node = g.nodes[ids[n]];
      var tw = textWidth(node.label, FS);
      var w = Math.max(46, tw + 2 * PADX);
      var h = FS + 2 * PADY + 4;
      if (node.shape === "diamond") { w += 18; h += 12; }
      if (node.shape === "circle") { w = h = Math.max(w, h) + 6; }
      if (node.shape === "cylinder") h += 10;
      geo[node.id] = { w: w, h: h };
    }
    var horizontal = g.dir === "LR" || g.dir === "RL";
    // main-axis position per rank; cross-axis within rank (centered later)
    var rowSpan = [];
    for (var q = 0; q < ranks.length; q++) {
      var span = 0;
      for (var u = 0; u < ranks[q].length; u++) {
        var gg = geo[ranks[q][u]];
        span += (horizontal ? gg.h : gg.w) + NODEGAP;
      }
      rowSpan.push(span - NODEGAP);
    }
    var maxSpan = Math.max.apply(null, rowSpan);
    var main = 14;
    for (var q2 = 0; q2 < ranks.length; q2++) {
      var cross = 14 + (maxSpan - rowSpan[q2]) / 2;
      var rankThick = 0;
      for (var u2 = 0; u2 < ranks[q2].length; u2++) {
        var id2 = ranks[q2][u2];
        var g2 = geo[id2];
        if (horizontal) {
          g2.x = main; g2.y = cross; cross += g2.h + NODEGAP;
          rankThick = Math.max(rankThick, g2.w);
        } else {
          g2.x = cross; g2.y = main; cross += g2.w + NODEGAP;
          rankThick = Math.max(rankThick, g2.h);
        }
      }
      main += rankThick + RANKGAP;
    }
    var W = 28 + (horizontal ? main - RANKGAP : maxSpan);
    var H = 28 + (horizontal ? maxSpan : main - RANKGAP);
    var out = [];
    out.push('<defs><marker id="dvm-arrow" viewBox="0 0 10 10" refX="9" ' +
      'refY="5" markerWidth="7" markerHeight="7" orient="auto-start-reverse">' +
      '<path d="M0,0 L10,5 L0,10 z" fill="#5c6670"/></marker></defs>');
    // edges under nodes
    for (var e2 = 0; e2 < g.edges.length; e2++) {
      var ed2 = g.edges[e2];
      var a = geo[ed2.from], b = geo[ed2.to];
      if (!a || !b) continue;
      var x1, y1, x2, y2;
      if (horizontal) {
        x1 = a.x + a.w; y1 = a.y + a.h / 2;
        x2 = b.x; y2 = b.y + b.h / 2;
        if (x2 < x1) { x1 = a.x; x2 = b.x + b.w; }
      } else {
        x1 = a.x + a.w / 2; y1 = a.y + a.h;
        x2 = b.x + b.w / 2; y2 = b.y;
        if (y2 < y1) { y1 = a.y; y2 = b.y + b.h; }
      }
      var mx = (x1 + x2) / 2, my = (y1 + y2) / 2;
      out.push('<path d="M' + x1 + ',' + y1 +
        ' C' + (horizontal ? mx + ',' + y1 : x1 + ',' + my) +
        ' ' + (horizontal ? mx + ',' + y2 : x2 + ',' + my) +
        ' ' + x2 + ',' + y2 +
        '" fill="none" stroke="#5c6670" stroke-width="1.4" ' +
        'marker-end="url(#dvm-arrow)"/>');
      if (ed2.label) {
        var lw = textWidth(ed2.label, FS - 2) + 8;
        out.push('<rect x="' + (mx - lw / 2) + '" y="' + (my - 9) +
          '" width="' + lw + '" height="16" rx="3" fill="#fff" ' +
          'fill-opacity="0.9"/>');
        out.push('<text x="' + mx + '" y="' + (my + 4) +
          '" text-anchor="middle" font-size="' + (FS - 2) +
          '" fill="#5c6670">' + esc(ed2.label) + '</text>');
      }
    }
    for (var n2 = 0; n2 < ids.length; n2++) {
      var nd = g.nodes[ids[n2]];
      var gm = geo[nd.id];
      var cx = gm.x + gm.w / 2, cy = gm.y + gm.h / 2;
      var fill = "#eef3fa", stroke = "#4e79a7";
      if (nd.shape === "diamond") {
        out.push('<polygon points="' +
          cx + ',' + gm.y + ' ' + (gm.x + gm.w) + ',' + cy + ' ' +
          cx + ',' + (gm.y + gm.h) + ' ' + gm.x + ',' + cy +
          '" fill="#fdf3e3" stroke="#e8a33d" stroke-width="1.4"/>');
      } else if (nd.shape === "circle") {
        out.push('<circle cx="' + cx + '" cy="' + cy + '" r="' +
          (gm.w / 2) + '" fill="' + fill + '" stroke="' + stroke +
          '" stroke-width="1.4"/>');
      } else if (nd.shape === "cylinder") {
        var ry = 6;
        out.push('<path d="M' + gm.x + ',' + (gm.y + ry) +
          ' a' + (gm.w / 2) + ',' + ry + ' 0 0 1 ' + gm.w + ',0' +
          ' v' + (gm.h - 2 * ry) +
          ' a' + (gm.w / 2) + ',' + ry + ' 0 0 1 -' + gm.w + ',0 z"' +
          ' fill="#eaf5ec" stroke="#59a14f" stroke-width="1.4"/>');
        out.push('<ellipse cx="' + cx + '" cy="' + (gm.y + ry) +
          '" rx="' + (gm.w / 2) + '" ry="' + ry +
          '" fill="none" stroke="#59a14f" stroke-width="1.4"/>');
      } else {
        out.push('<rect x="' + gm.x + '" y="' + gm.y + '" width="' + gm.w +
          '" height="' + gm.h + '" rx="' +
          (nd.shape === "round" ? gm.h / 2 : 4) +
          '" fill="' + fill + '" stroke="' + stroke +
          '" stroke-width="1.4"/>');
      }
      out.push('<text x="' + cx + '" y="' + (cy + 4.5) +
        '" text-anchor="middle" font-size="13" fill="#25303a">' +
        esc(nd.label) + '</text>');
    }
    return wrap(W, H, out.join(""));
  }

  /* ---------------------------------------------------------------- */
  /* pie                                                               */
  /* ---------------------------------------------------------------- */

  function parsePie(src) {
    var lines = src.split("\n");
    if (!/^pie\b/.test(lines[0].trim())) return null;
    var title = (lines[0].trim().match(/^pie\s+title\s+(.*)$/) || [])[1] || "";
    var slices = [];
    for (var i = 1; i < lines.length; i++) {
      var line = lines[i].trim();
      if (!line) continue;
      var tm = line.match(/^title\s+(.*)$/);
      if (tm) { title = tm[1]; continue; }
      var m = line.match(/^"([^"]*)"\s*:\s*([0-9.]+)\s*$/);
      if (m) slices.push({ label: m[1], value: parseFloat(m[2]) });
    }
    if (!slices.length) return null;
    return { title: title, slices: slices };
  }

  function pieSvg(p) {
    var R = 78, CX = 100, CY = (p.title ? 118 : 96);
    var total = 0;
    for (var i = 0; i < p.slices.length; i++) total += p.slices[i].value;
    if (!(total > 0)) return null;
    var out = [];
    if (p.title) {
      out.push('<text x="' + CX + '" y="22" text-anchor="middle" ' +
        'font-size="14" font-weight="600" fill="#25303a">' +
        esc(p.title) + '</text>');
    }
    var angle = -Math.PI / 2;
    var legendY = CY - R + 6;
    var legendX = CX + R + 26;
    var maxLegendW = 0;
    for (var s = 0; s < p.slices.length; s++) {
      var sl = p.slices[s];
      var frac = sl.value / total;
      var a2 = angle + frac * 2 * Math.PI;
      var x1 = CX + R * Math.cos(angle), y1 = CY + R * Math.sin(angle);
      var x2 = CX + R * Math.cos(a2), y2 = CY + R * Math.sin(a2);
      var large = frac > 0.5 ? 1 : 0;
      var color = PALETTE[s % PALETTE.length];
      if (frac >= 0.999) {
        out.push('<circle cx="' + CX + '" cy="' + CY + '" r="' + R +
          '" fill="' + color + '"/>');
      } else {
        out.push('<path d="M' + CX + ',' + CY + ' L' + x1 + ',' + y1 +
          ' A' + R + ',' + R + ' 0 ' + large + ',1 ' + x2 + ',' + y2 +
          ' z" fill="' + color + '" stroke="#fff" stroke-width="1"/>');
      }
      // percentage label inside the slice
      var mid = (angle + a2) / 2;
      if (frac > 0.06) {
        out.push('<text x="' + (CX + R * 0.62 * Math.cos(mid)) +
          '" y="' + (CY + R * 0.62 * Math.sin(mid) + 4) +
          '" text-anchor="middle" font-size="11" fill="#fff">' +
          Math.round(frac * 100) + '%</text>');
      }
      var legend = sl.label + ' (' + sl.value + ')';
      out.push('<rect x="' + legendX + '" y="' + (legendY - 9) +
        '" width="11" height="11" rx="2" fill="' + color + '"/>');
      out.push('<text x="' + (legendX + 17) + '" y="' + (legendY + 1) +
        '" font-size="12" fill="#3a4550">' + esc(legend) + '</text>');
      maxLegendW = Math.max(maxLegendW, textWidth(legend, 12) + 20);
      legendY += 20;
      angle = a2;
    }
    var W = legendX + maxLegendW + 10;
    var H = Math.max(CY + R + 16, legendY + 4);
    return wrap(W, H, out.join(""));
  }

  /* ---------------------------------------------------------------- */
  /* quadrantChart                                                     */
  /* ---------------------------------------------------------------- */

  function parseQuadrant(src) {
    var lines = src.split("\n");
    if (!/^quadrantChart\b/.test(lines[0].trim())) return null;
    var q = { title: "", xAxis: ["", ""], yAxis: ["", ""],
              quadrants: ["", "", "", ""], points: [] };
    for (var i = 1; i < lines.length; i++) {
      var line = lines[i].trim();
      if (!line) continue;
      var m;
      if ((m = line.match(/^title\s+(.*)$/))) { q.title = m[1]; continue; }
      if ((m = line.match(/^x-axis\s+(.*?)(?:\s*-->\s*(.*))?$/))) {
        q.xAxis = [m[1], m[2] || ""]; continue;
      }
      if ((m = line.match(/^y-axis\s+(.*?)(?:\s*-->\s*(.*))?$/))) {
        q.yAxis = [m[1], m[2] || ""]; continue;
      }
      if ((m = line.match(/^quadrant-([1-4])\s+(.*)$/))) {
        q.quadrants[parseInt(m[1], 10) - 1] = m[2]; continue;
      }
      if ((m = line.match(/^(.+?):\s*\[\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\]$/))) {
        q.points.push({ label: m[1].trim(), x: parseFloat(m[2]),
                        y: parseFloat(m[3]) });
      }
    }
    if (!q.points.length && !q.title) return null;
    return q;
  }

  function quadrantSvg(q) {
    var S = 240, X0 = 70, Y0 = (q.title ? 44 : 24);
    var W = X0 + S + 80, H = Y0 + S + 46;
    var out = [];
    if (q.title) {
      out.push('<text x="' + (X0 + S / 2) + '" y="24" text-anchor="middle"' +
        ' font-size="14" font-weight="600" fill="#25303a">' +
        esc(q.title) + '</text>');
    }
    // quadrant shading
    var shades = ["#f3f7fb", "#fbf6ee", "#f4f9f4", "#faf3f3"];
    var qrects = [
      [X0 + S / 2, Y0, shades[0]], [X0, Y0, shades[1]],
      [X0, Y0 + S / 2, shades[2]], [X0 + S / 2, Y0 + S / 2, shades[3]],
    ];
    for (var r = 0; r < 4; r++) {
      out.push('<rect x="' + qrects[r][0] + '" y="' + qrects[r][1] +
        '" width="' + S / 2 + '" height="' + S / 2 + '" fill="' +
        qrects[r][2] + '"/>');
      if (q.quadrants[r]) {
        out.push('<text x="' + (qrects[r][0] + S / 4) + '" y="' +
          (qrects[r][1] + 16) + '" text-anchor="middle" font-size="11" ' +
          'fill="#8a949e">' + esc(q.quadrants[r]) + '</text>');
      }
    }
    out.push('<rect x="' + X0 + '" y="' + Y0 + '" width="' + S +
      '" height="' + S + '" fill="none" stroke="#c6ccd2"/>');
    out.push('<line x1="' + (X0 + S / 2) + '" y1="' + Y0 + '" x2="' +
      (X0 + S / 2) + '" y2="' + (Y0 + S) +
      '" stroke="#c6ccd2" stroke-dasharray="4,3"/>');
    out.push('<line x1="' + X0 + '" y1="' + (Y0 + S / 2) + '" x2="' +
      (X0 + S) + '" y2="' + (Y0 + S / 2) +
      '" stroke="#c6ccd2" stroke-dasharray="4,3"/>');
    // axis labels
    out.push('<text x="' + X0 + '" y="' + (Y0 + S + 18) +
      '" font-size="12" fill="#5c6670">' + esc(q.xAxis[0]) + '</text>');
    if (q.xAxis[1]) {
      out.push('<text x="' + (X0 + S) + '" y="' + (Y0 + S + 18) +
        '" text-anchor="end" font-size="12" fill="#5c6670">' +
        esc(q.xAxis[1]) + '</text>');
    }
    out.push('<text x="' + (X0 - 8) + '" y="' + (Y0 + S) +
      '" text-anchor="end" font-size="12" fill="#5c6670">' +
      esc(q.yAxis[0]) + '</text>');
    if (q.yAxis[1]) {
      out.push('<text x="' + (X0 - 8) + '" y="' + (Y0 + 12) +
        '" text-anchor="end" font-size="12" fill="#5c6670">' +
        esc(q.yAxis[1]) + '</text>');
    }
    for (var p = 0; p < q.points.length; p++) {
      var pt = q.points[p];
      var px = X0 + Math.max(0, Math.min(1, pt.x)) * S;
      var py = Y0 + S - Math.max(0, Math.min(1, pt.y)) * S;
      var color = PALETTE[p % PALETTE.length];
      out.push('<circle cx="' + px + '" cy="' + py +
        '" r="5" fill="' + color + '"/>');
      out.push('<text x="' + (px + 8) + '" y="' + (py + 4) +
        '" font-size="12" fill="#3a4550">' + esc(pt.label) + '</text>');
    }
    return wrap(W, H, out.join(""));
  }

  function wrap(w, h, body) {
    return '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 ' +
      Math.ceil(w) + ' ' + Math.ceil(h) + '" width="' + Math.ceil(w) +
      '" height="' + Math.ceil(h) + '" class="dv-mermaid" role="img">' +
      body + '</svg>';
  }

  function render(src) {
    try {
      var s = (src || "").trim();
      var head = s.split("\n", 1)[0].trim();
      if (/^(flowchart|graph)\b/.test(head)) {
        var g = parseFlowchart(s);
        return g ? flowchartSvg(g) : null;
      }
      if (/^pie\b/.test(head)) {
        var p = parsePie(s);
        return p ? pieSvg(p) : null;
      }
      if (/^quadrantChart\b/.test(head)) {
        var q = parseQuadrant(s);
        return q ? quadrantSvg(q) : null;
      }
      return null;  // unsupported type: caller shows the code block
    } catch (e) {
      return null;  // any parse/layout failure: safe fallback
    }
  }

  window.DVMermaid = { render: render };
})();
