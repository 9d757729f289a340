/* Solution page renderer — consumes the FULL A.5 payload
   (hero / headline_cards / decision_summary / chapter_copy / proposal_page /
   narrative_outline / audience_profile / content_priority_plan /
   comparison_matrix / value_board / proposal_support / sections /
   quality_review / page_copy / closing_block / summary_card).
   Re-implements reference web/solution.js (3,797 LoC) against the same
   payload contract (reference web/server.py:43078-43114). */
(function () {
  "use strict";

  const esc = (s) => String(s == null ? "" : s)
    .replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;")
    .replace(/"/g, "&quot;");

  const KIND_LABELS = { need: "需求", risk: "风险", action: "行动" };

  let PAYLOAD = null;
  let IS_SHARE_VIEW = false;
  let REPORT_NAME = null;

  async function boot() {
    const params = new URLSearchParams(location.search);
    REPORT_NAME = params.get("report");
    const share = params.get("share");
    IS_SHARE_VIEW = Boolean(share);
    let url = null;
    if (share) url = `/api/public/solutions/${encodeURIComponent(share)}`;
    else if (REPORT_NAME) {
      url = `/api/reports/${encodeURIComponent(REPORT_NAME)}/solution`;
    }
    if (!url) return fail("缺少 report 或 share 参数");
    try {
      const resp = await fetch(url, { credentials: "same-origin" });
      if (!resp.ok) {
        const b = await resp.json().catch(() => ({}));
        if (resp.status === 401) {
          return fail("请先登录后再查看方案页", "/");
        }
        return fail(b.error || `HTTP ${resp.status}`);
      }
      PAYLOAD = await resp.json();
      render(PAYLOAD);
      wireInteractions();
    } catch (e) {
      fail(e.message);
    }
  }

  function fail(msg, backHref) {
    document.body.innerHTML = `<div class="err-box">
      <h2>无法加载方案页</h2><p>${esc(msg)}</p>
      <p><a href="${esc(backHref || "/")}">返回首页</a></p></div>`;
  }

  // ------------------------------------------------------------------
  // Render
  // ------------------------------------------------------------------

  function render(p) {
    document.title = `${p.title || "解决方案"} · DeepVision`;
    const degraded = p.source_mode === "degraded";
    const parts = [];

    if (degraded) {
      parts.push(`<div class="degraded-banner">
        当前报告质量信号不足，以下为简版方案页 —
        建议补充访谈后重新生成报告。</div>`);
    }
    parts.push(renderHero(p.hero || {}, p, degraded));
    parts.push(renderNav(p.nav_items || []));
    parts.push('<div class="page">');

    parts.push(renderHeadlineCards(p.headline_cards || []));
    parts.push(renderDecisionBrief(p.decision_brief));
    parts.push(renderDecisionSummary(p.decision_summary || {}));
    parts.push(renderChapterCopy(p.chapter_copy || {}));
    parts.push(renderProposalPage(p.proposal_page || {}));
    parts.push(renderPriorityPlan(p.content_priority_plan || {}));
    parts.push(renderComparisonMatrix(p.comparison_matrix));
    parts.push(renderValueBoard(p.value_board));
    parts.push(renderEvidence(p.proposal_support || {}));
    parts.push(renderNarrativeOutline(p.narrative_outline || []));
    parts.push(renderSections(p.sections || []));
    parts.push(renderQualityReview(p.quality_review || {}));
    parts.push(renderAudienceProfile(p.audience_profile || {}));
    parts.push(renderClosing(p));
    parts.push(renderFooter(p));
    parts.push("</div>");
    parts.push('<button class="back-top" title="回到顶部">↑</button>');

    document.body.innerHTML = parts.filter(Boolean).join("\n");
  }

  function renderHero(h, p, degraded) {
    const actions = (h.actions || []).map((a) =>
      `<a class="hero-btn" href="${esc(a.href)}" target="_blank">${
        esc(a.label)}</a>`);
    if (!IS_SHARE_VIEW) {
      actions.push('<a class="hero-btn" href="#" data-act="share">复制分享链接</a>');
    }
    actions.push('<a class="hero-btn" href="#" data-act="print">打印 / 存为 PDF</a>');
    return `<div class="hero"><div class="inner">
      <div class="eyebrow">${esc(h.eyebrow || "解决方案")}${
        degraded && !(h.eyebrow || "").includes("简版") ? "（简版）" : ""}</div>
      <h1>${esc(h.title || p.title || "")}</h1>
      <div class="subtitle">${esc(h.subtitle || "")}</div>
      <div class="summary">${esc(h.summary || "")}</div>
      <div class="highlights">${(h.highlights || []).map((x) =>
        `<span class="highlight">${esc(x)}</span>`).join("")}</div>
      <div class="metrics">${(h.metrics || []).map((m) =>
        `<div class="metric"><div class="v">${esc(m.value)}</div>
         <div class="k">${esc(m.label)}</div></div>`).join("")}</div>
      <div class="actions">${actions.join(" ")}</div>
      </div></div>`;
  }

  function renderNav(items) {
    if (!items.length) return "";
    return `<nav class="solution-nav" id="solution-nav">${items.map((n) =>
      `<a href="#${esc(n.id)}" data-target="${esc(n.id)}">${
        esc(n.title)}</a>`).join("")}</nav>`;
  }

  function renderHeadlineCards(cards) {
    if (!cards.length) return "";
    return `<div class="panel"><div class="cards">${
      cards.map((c) => `
        <div class="hcard ${esc(c.tone || "")}">
          <div class="t">${esc(c.title)}</div>
          <div class="b">${esc(c.body)}</div>
        </div>`).join("")}</div></div>`;
  }

  function renderDecisionSummary(ds) {
    if (!ds.conclusion && !(ds.top_needs || []).length) return "";
    const col = (title, items, cls) => (items || []).length
      ? `<div class="decision-col ${cls}">
           <div class="label">${title}</div>
           <ul>${items.map((i) => `<li>${esc(i)}</li>`).join("")}</ul>
         </div>`
      : "";
    return `<div class="panel decision-band" id="decision-summary">
      <h2>决策摘要</h2>
      <p class="conclusion">${esc(ds.conclusion || "")}</p>
      <div class="decision-grid">
        ${col("核心需求", ds.top_needs, "needs")}
        ${col("主要风险", ds.top_risks, "risks")}
        ${col("下一步行动", ds.next_actions, "actions")}
      </div></div>`;
  }

  function renderChapterCopy(cc) {
    if (!cc.value_statement) return "";
    return `<div class="panel"><div class="copy-strip">
      <div class="cell"><div class="label">价值主张</div>${
        esc(cc.value_statement)}</div>
      <div class="cell"><div class="label">实施路径</div>${
        esc(cc.approach)}</div>
      <div class="cell"><div class="label">交付承诺</div>${
        esc(cc.commitment)}</div>
    </div></div>`;
  }

  function renderProposalPage(pp) {
    if (!(pp.chapters || []).length) return "";
    return `<div class="panel" id="proposal-page">
      <h2>${esc(pp.title || "方案建议")}</h2>
      <p class="pitch">${esc(pp.pitch || "")}</p>
      <div class="chapter-strip">${pp.chapters.map((c, i) => `
        <a class="chapter-card" href="#${esc(c.id)}">
          <div class="n">${String(i + 1).padStart(2, "0")}</div>
          <div class="t">${esc(c.title)}</div>
          <div class="s">${esc(c.summary || "")}</div>
        </a>`).join("")}</div></div>`;
  }

  function renderPriorityPlan(plan) {
    if (!(plan.items || []).length) return "";
    return `<div class="panel" id="priority-plan"><h2>优先级计划</h2>${
      plan.items.map((i) => `
        <div class="plan-item">
          <span class="pri ${esc(i.priority)}">${esc(i.priority)}</span>
          <span class="txt">${esc(i.content)}</span>
          <span class="kind kind-${esc(i.kind)}">${
            KIND_LABELS[i.kind] || ""}</span>
        </div>`).join("")}</div>`;
  }

  function renderComparisonMatrix(cm) {
    if (!cm || !(cm.options || []).length) return "";
    let t = `<div class="panel" id="comparison"><h2>方案对比</h2>
      <div class="table-scroll">
      <table class="matrix"><thead><tr><th>方案</th>${
      (cm.criteria || []).map((c) => `<th>${esc(c)}</th>`).join("")
      }</tr></thead><tbody>`;
    cm.options.forEach((o) => {
      const rec = o.name === "推荐方案";
      t += `<tr class="${rec ? "rec-row" : ""}">
        <td class="${rec ? "rec" : ""}">${esc(o.name)}${
        rec ? '<span class="rec-chip">推荐</span>' : ""}${
        o.summary
          ? `<div class="opt-summary">${esc(o.summary)}</div>` : ""
      }</td>${(cm.criteria || []).map((c) =>
        `<td class="${rec ? "rec" : ""}">${esc((o.scores || {})[c] || "")}</td>`
      ).join("")}</tr>`;
    });
    t += "</tbody></table></div></div>";
    return t;
  }

  function renderValueBoard(vb) {
    if (!vb || !(vb.columns || []).length) return "";
    return `<div class="panel" id="value-board"><h2>价值看板</h2>
      <div class="value-board">${vb.columns.map((c) => `
        <div class="value-col"><div class="t">${esc(c.title)}</div>
          <ul>${c.items.map((i) => `<li>${esc(i)}</li>`).join("")}</ul>
        </div>`).join("")}</div></div>`;
  }

  function renderEvidence(sup) {
    if (!(sup.evidence || []).length) return "";
    return `<div class="panel" id="evidence"><h2>证据支撑
      <span class="evidence-count">${(sup.q_ids || []).length} 处访谈引用</span>
      </h2>${sup.evidence.map((e) => `
        <div class="plan-item evidence-item"><span class="txt">${
          esc(e.claim)}</span>
          <span class="refs">${(e.refs || []).map((r) =>
            `<a class="qref" href="#" data-qref="${esc(r)}">${
              esc(r)}</a>`).join("")}</span>
        </div>`).join("")}</div>`;
  }

  // Evidence drawer: a reference chip opens the underlying Q/A
  // (reference solutionBindEvidenceDrawer, web/solution.js).
  function openEvidenceDrawer(qid) {
    const detail = ((PAYLOAD.proposal_support || {})
      .evidence_detail || {})[qid];
    closeEvidenceDrawer();
    const d = document.createElement("div");
    d.className = "evidence-drawer open";
    d.id = "evidence-drawer";
    d.innerHTML = detail ? `
      <div class="drawer-head">
        <span class="qref">${esc(qid)}</span>
        <span class="dim">${esc(detail.dimension || "")}</span>
        <a href="#" class="drawer-close" data-act="drawer-close">✕</a>
      </div>
      <div class="drawer-q">${esc(detail.question || "")}</div>
      <div class="drawer-a">${esc(detail.answer || "")}</div>
      ${detail.rationale
        ? `<div class="drawer-r">补充说明：${esc(detail.rationale)}</div>`
        : ""}`
      : `<div class="drawer-head"><span class="qref">${esc(qid)}</span>
           <a href="#" class="drawer-close" data-act="drawer-close">✕</a>
         </div>
         <div class="drawer-a muted">该引用没有可展示的问答详情。</div>`;
    document.body.appendChild(d);
  }

  function closeEvidenceDrawer() {
    const d = document.getElementById("evidence-drawer");
    if (d) d.remove();
  }

  function renderDecisionBrief(db) {
    if (!db || !db.headline) return "";
    const row = (label, text) => text
      ? `<div class="scqa-row"><span class="scqa-label">${label}</span>
           <span class="scqa-text">${esc(text)}</span></div>`
      : "";
    return `<div class="panel decision-brief" id="decision-brief">
      <h2>决策简报</h2>
      <p class="headline">${esc(db.headline)}</p>
      ${row("现状", db.situation)}
      ${row("挑战", db.complication)}
      ${row("解法", db.resolution)}
      <div class="scqa-asks"><span class="scqa-label">请求决策</span>
        <ul>${(db.asks || []).map((a) => `<li>${esc(a)}</li>`).join("")}
        </ul></div></div>`;
  }

  function renderNarrativeOutline(outline) {
    if ((outline || []).length < 2) return "";
    return `<div class="panel" id="narrative"><h2>叙事主线</h2>
      <ol class="timeline">${outline.map((t) => `
        <li><span class="dot"></span>
          <a class="beat" href="#${esc(t.anchor || "")}">
            <span class="stage">${esc(t.stage || "")}</span>
            <span class="beat-title">${esc(t.title || "")}</span>
          </a>
          <div class="beat-summary">${esc(t.summary || t.hook || "")}</div>
        </li>`).join("")}</ol></div>`;
  }

  function renderSections(sections) {
    const COLLAPSE_OVER = 1200; // chars of body before folding
    return sections.filter((s) => s.level !== 1).map((s) => {
      const body = DVMarkdown.render(s.content || "");
      const long = (s.content || "").length > COLLAPSE_OVER;
      return `<div class="panel section ${long ? "collapsible folded" : ""}"
        id="${esc(s.id)}">
        <h2>${esc(s.title)}${long
          ? '<a class="fold-toggle" href="#" data-act="fold">展开全文</a>'
          : ""}</h2>
        <div class="section-body">${body}</div>
      </div>`;
    }).join("\n");
  }

  function renderQualityReview(qr) {
    if (!qr.verdict && qr.score == null) return "";
    const good = (qr.score || 0) >= 0.6;
    return `<div class="panel" id="quality"><h2>质量评审
      <span class="quality-chip ${good ? "" : "bad"}">${
        esc(qr.verdict || "")} · ${Number(qr.score || 0).toFixed(2)}</span>
      </h2>
      ${(qr.strengths || []).map((s) =>
        `<div class="qr-line ok">✔ ${esc(s)}</div>`).join("")}
      ${(qr.concerns || []).map((s) =>
        `<div class="qr-line warn">⚠ ${esc(s)}</div>`).join("")}
    </div>`;
  }

  function renderAudienceProfile(ap) {
    if (!ap.primary) return "";
    return `<div class="panel audience" id="audience">
      <h2>阅读指引</h2>
      <div class="chips">
        <span class="chip">主要读者：${esc(ap.primary)}</span>
        <span class="chip">次要读者：${esc(ap.secondary || "")}</span>
        <span class="chip">建议深度：${esc(ap.reading_depth || "标准")}</span>
      </div></div>`;
  }

  function renderClosing(p) {
    const cb = p.closing_block || {};
    const pc = p.page_copy || {};
    return `<div class="closing"><h2>${esc(cb.title || "下一步")}</h2>
      <ul>${(cb.items || []).map((i) => `<li>${esc(i)}</li>`).join("")}</ul>
      ${pc.cta_label && !IS_SHARE_VIEW
        ? `<a class="cta" href="/" target="_blank">${esc(pc.cta_label)}</a>`
        : ""}
      <div class="closing-note">${esc(pc.closing_note || "")}</div></div>`;
  }

  function renderFooter(p) {
    const meta = p.solution_schema_meta || {};
    return `<div class="footer-note">由 DeepVision TPU 引擎生成 ·
      schema v${esc(meta.version || "")} · ${esc(meta.section_count || 0)} 节 ·
      指纹 ${esc(p.fingerprint || "")} · ${esc(p.generated_at || "")}</div>`;
  }

  // ------------------------------------------------------------------
  // Interactions: scroll-spy nav, fold toggles, share, print, back-top
  // ------------------------------------------------------------------

  function wireInteractions() {
    const nav = document.getElementById("solution-nav");
    if (nav && "IntersectionObserver" in window) {
      const links = Array.from(nav.querySelectorAll("a[data-target]"));
      const byId = {};
      links.forEach((a) => { byId[a.dataset.target] = a; });
      const io = new IntersectionObserver((entries) => {
        entries.forEach((en) => {
          const link = byId[en.target.id];
          if (link && en.isIntersecting) {
            links.forEach((l) => l.classList.remove("active"));
            link.classList.add("active");
          }
        });
      }, { rootMargin: "-20% 0px -70% 0px" });
      links.forEach((a) => {
        const el = document.getElementById(a.dataset.target);
        if (el) io.observe(el);
      });
    }

    document.body.addEventListener("click", async (ev) => {
      const ref = ev.target.closest("[data-qref]");
      if (ref) {
        ev.preventDefault();
        openEvidenceDrawer(ref.dataset.qref);
        return;
      }
      const act = ev.target.closest("[data-act]");
      if (!act) return;
      ev.preventDefault();
      if (act.dataset.act === "print") window.print();
      else if (act.dataset.act === "drawer-close") closeEvidenceDrawer();
      else if (act.dataset.act === "share") await copyShareLink(act);
      else if (act.dataset.act === "fold") {
        const panel = act.closest(".collapsible");
        panel.classList.toggle("folded");
        act.textContent = panel.classList.contains("folded")
          ? "展开全文" : "收起";
      }
    });

    const backTop = document.querySelector(".back-top");
    if (backTop) {
      window.addEventListener("scroll", () => {
        backTop.classList.toggle("show", window.scrollY > 600);
      }, { passive: true });
      backTop.addEventListener("click", () =>
        window.scrollTo({ top: 0, behavior: "smooth" }));
    }
  }

  async function copyShareLink(btn) {
    try {
      const resp = await fetch(
        `/api/reports/${encodeURIComponent(REPORT_NAME)}/solution/share`,
        { method: "POST", credentials: "same-origin",
          headers: { "Content-Type": "application/json" }, body: "{}" });
      if (resp.status === 403) {
        btn.textContent = "当前等级不支持分享";
        return;
      }
      if (!resp.ok) throw new Error(`HTTP ${resp.status}`);
      const data = await resp.json();
      const url = `${location.origin}/solution.html?share=${
        encodeURIComponent(data.share_token)}`;
      if (navigator.clipboard) await navigator.clipboard.writeText(url);
      btn.textContent = "已复制分享链接 ✔";
      setTimeout(() => { btn.textContent = "复制分享链接"; }, 2500);
    } catch (e) {
      btn.textContent = "分享失败，请重试";
    }
  }

  document.addEventListener("DOMContentLoaded", boot);
})();
