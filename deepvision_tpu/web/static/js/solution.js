/* Solution page renderer — consumes the full A.5 payload
   (hero / headline_cards / chapter_copy / content_priority_plan /
   comparison_matrix / value_board / proposal_support / sections / closing).
   Re-implements reference web/solution.js (3,797 LoC) against the same
   payload contract (reference web/server.py:43078-43114). */
(function () {
  "use strict";

  const esc = (s) => String(s == null ? "" : s)
    .replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;")
    .replace(/"/g, "&quot;");

  async function boot() {
    const params = new URLSearchParams(location.search);
    const report = params.get("report");
    const share = params.get("share");
    let url = null;
    if (share) url = `/api/public/solutions/${encodeURIComponent(share)}`;
    else if (report) url = `/api/reports/${encodeURIComponent(report)}/solution`;
    if (!url) return fail("缺少 report 或 share 参数");
    try {
      const resp = await fetch(url, { credentials: "same-origin" });
      if (!resp.ok) {
        const b = await resp.json().catch(() => ({}));
        return fail(b.error || `HTTP ${resp.status}`);
      }
      render(await resp.json());
    } catch (e) {
      fail(e.message);
    }
  }

  function fail(msg) {
    document.body.innerHTML = `<div class="err-box">
      <h2>无法加载方案页</h2><p>${esc(msg)}</p>
      <p><a href="/">返回首页</a></p></div>`;
  }

  function render(p) {
    document.title = `${p.title || "解决方案"} · DeepVision`;
    const degraded = p.source_mode === "degraded";
    const parts = [];

    parts.push(renderHero(p.hero || {}, p, degraded));
    parts.push(renderNav(p.nav_items || []));
    parts.push('<div class="page">');

    if ((p.headline_cards || []).length) {
      parts.push(`<div class="panel"><div class="cards">${
        p.headline_cards.map((c) => `
          <div class="hcard ${esc(c.tone || "")}">
            <div class="t">${esc(c.title)}</div>
            <div class="b">${esc(c.body)}</div>
          </div>`).join("")}</div></div>`);
    }

    const cc = p.chapter_copy || {};
    if (cc.value_statement) {
      parts.push(`<div class="panel"><div class="copy-strip">
        <div class="cell"><div class="label">价值主张</div>${esc(cc.value_statement)}</div>
        <div class="cell"><div class="label">实施路径</div>${esc(cc.approach)}</div>
        <div class="cell"><div class="label">交付承诺</div>${esc(cc.commitment)}</div>
      </div></div>`);
    }

    const plan = p.content_priority_plan || {};
    if ((plan.items || []).length) {
      parts.push(`<div class="panel"><h2>优先级计划</h2>${
        plan.items.map((i) => `
          <div class="plan-item">
            <span class="pri ${esc(i.priority)}">${esc(i.priority)}</span>
            <span>${esc(i.content)}</span>
            <span class="kind">${
              { need: "需求", risk: "风险", action: "行动" }[i.kind] || ""}</span>
          </div>`).join("")}</div>`);
    }

    const cm = p.comparison_matrix;
    if (cm && (cm.options || []).length) {
      let t = `<div class="panel"><h2>方案对比</h2>
        <table class="matrix"><thead><tr><th>方案</th>${
        cm.criteria.map((c) => `<th>${esc(c)}</th>`).join("")}</tr></thead><tbody>`;
      cm.options.forEach((o) => {
        const rec = o.name === "推荐方案";
        t += `<tr><td class="${rec ? "rec" : ""}">${esc(o.name)}${
          o.summary ? `<div style="font-weight:400;font-size:12px;color:#64748b">${esc(o.summary)}</div>` : ""
        }</td>${cm.criteria.map((c) =>
          `<td class="${rec ? "rec" : ""}">${esc((o.scores || {})[c] || "")}</td>`
        ).join("")}</tr>`;
      });
      t += "</tbody></table></div>";
      parts.push(t);
    }

    const vb = p.value_board;
    if (vb && (vb.columns || []).length) {
      parts.push(`<div class="panel"><h2>价值看板</h2>
        <div class="value-board">${vb.columns.map((c) => `
          <div class="value-col"><div class="t">${esc(c.title)}</div>
            <ul>${c.items.map((i) => `<li>${esc(i)}</li>`).join("")}</ul>
          </div>`).join("")}</div></div>`);
    }

    const sup = p.proposal_support || {};
    if ((sup.evidence || []).length) {
      parts.push(`<div class="panel"><h2>证据支撑</h2>${
        sup.evidence.map((e) => `
          <div class="plan-item"><span>${esc(e.claim)}</span>
            <span class="kind">${(e.refs || []).map(esc).join(" · ")}</span>
          </div>`).join("")}</div>`);
    }

    // full sections (render_model)
    (p.sections || []).forEach((s) => {
      if (s.level === 1) return; // title already in hero
      parts.push(`<div class="panel" id="${esc(s.id)}">
        <h2>${esc(s.title)}</h2>${DVMarkdown.render(s.content || "")}</div>`);
    });

    // quality review
    const qr = p.quality_review || {};
    if (qr.verdict || qr.score != null) {
      const good = (qr.score || 0) >= 0.6;
      parts.push(`<div class="panel"><h2>质量评审
        <span class="quality-chip ${good ? "" : "bad"}">${
          esc(qr.verdict || "")} · ${Number(qr.score || 0).toFixed(2)}</span></h2>
        ${(qr.strengths || []).map((s) => `<div>✔ ${esc(s)}</div>`).join("")}
        ${(qr.concerns || []).map((s) => `<div>⚠ ${esc(s)}</div>`).join("")}
      </div>`);
    }

    const cb = p.closing_block || {};
    parts.push(`<div class="closing"><h2>${esc(cb.title || "下一步")}</h2>
      <ul>${(cb.items || []).map((i) => `<li>${esc(i)}</li>`).join("")}</ul>
      <div style="margin-top:10px;font-size:13px;opacity:.8">${
        esc((p.page_copy || {}).closing_note || "")}</div></div>`);

    parts.push(`<div class="footer-note">由 DeepVision TPU 引擎生成 ·
      指纹 ${esc(p.fingerprint || "")} · ${esc(p.generated_at || "")}</div>`);
    parts.push("</div>");

    document.body.innerHTML = parts.join("\n");
  }

  function renderHero(h, p, degraded) {
    return `<div class="hero"><div class="inner">
      <div class="eyebrow">${esc(h.eyebrow || "解决方案")}${
        degraded ? "（简版）" : ""}</div>
      <h1>${esc(h.title || p.title || "")}</h1>
      <div class="subtitle">${esc(h.subtitle || "")}</div>
      <div class="summary">${esc(h.summary || "")}</div>
      <div class="highlights">${(h.highlights || []).map((x) =>
        `<span class="highlight">${esc(x)}</span>`).join("")}</div>
      <div class="metrics">${(h.metrics || []).map((m) =>
        `<div class="metric"><div class="v">${esc(m.value)}</div>
         <div class="k">${esc(m.label)}</div></div>`).join("")}</div>
      <div class="actions">${(h.actions || []).map((a) =>
        `<a href="${esc(a.href)}" target="_blank">${esc(a.label)}</a>`).join(" ")}
      </div></div></div>`;
  }

  function renderNav(items) {
    if (!items.length) return "";
    return `<nav class="solution-nav">${items.map((n) =>
      `<a href="#${esc(n.id)}">${esc(n.title)}</a>`).join("")}</nav>`;
  }

  document.addEventListener("DOMContentLoaded", boot);
})();
