/* Reports: list (search/profile filters, variant chains, batch mode),
   detail (markdown render + TOC, exports w/ history, regenerate-with-profile,
   presentation chain, solution page entry, share).
   Re-implements reference web/app_modules/report_state.js (891 LoC) +
   report_detail_runtime.js (2,610 LoC). */
(function () {
  "use strict";

  let page = 1;
  const PAGE_SIZE = 20;

  const ui = {
    query: "",
    profileFilter: "all",   // all | balanced | quality | release-conservative
    batchMode: false,
    selected: new Set(),    // report_names picked in batch mode
  };
  let lastItems = [];
  let lastTotal = 0;

  const PROFILE_LABELS = {
    balanced: "均衡", quality: "精研", "release-conservative": "发布稳健",
  };

  // ---- list view ----------------------------------------------------
  async function mountList(el) {
    el.innerHTML = `
      <div class="row between">
        <h2 style="margin:0">我的报告</h2>
        <button class="small secondary" id="rl-batch-btn">批量管理</button>
      </div>
      <div class="card" style="margin-top:14px">
        <div class="row list-toolbar">
          <input id="rl-search" placeholder="搜索主题 / 文件名…"
            style="flex:1;min-width:160px">
          <div class="row" id="rl-profile-chips"></div>
        </div>
        <div class="row" id="rl-batch-bar" style="display:none;margin:8px 0">
          <label class="row" style="gap:6px">
            <input type="checkbox" id="rl-select-all"> 全选本页</label>
          <span class="muted" id="rl-sel-count"></span>
          <button class="small" id="rl-batch-del"
            style="color:var(--err)">删除所选</button>
        </div>
        <div id="report-table"><div class="thinking">
          <div class="spinner"></div>加载中…</div></div>
        <div class="pager" id="report-pager"></div>
      </div>`;
    if (!DV.state.user) {
      el.querySelector("#report-table").innerHTML =
        '<div class="empty">请先登录</div>';
      return;
    }
    el.querySelector("#rl-batch-btn").onclick = () => {
      ui.batchMode = !ui.batchMode;
      ui.selected.clear();
      el.querySelector("#rl-batch-btn").classList.toggle(
        "secondary", !ui.batchMode);
      el.querySelector("#rl-batch-bar").style.display =
        ui.batchMode ? "" : "none";
      render(el);
    };
    const search = el.querySelector("#rl-search");
    search.value = ui.query;
    let debounce = null;
    search.oninput = () => {
      clearTimeout(debounce);
      debounce = setTimeout(() => {
        ui.query = search.value.trim();
        render(el);
      }, 150);
    };
    const chips = el.querySelector("#rl-profile-chips");
    [["all", "全部"], ["balanced", "均衡"], ["quality", "精研"],
     ["release-conservative", "发布稳健"]].forEach(([val, label]) => {
      const b = document.createElement("button");
      b.className = "small " + (ui.profileFilter === val ? "" : "secondary");
      b.textContent = label;
      b.onclick = () => {
        ui.profileFilter = val;
        chips.querySelectorAll("button").forEach((x) =>
          x.classList.add("secondary"));
        b.classList.remove("secondary");
        render(el);
      };
      chips.appendChild(b);
    });
    el.querySelector("#rl-select-all").onchange = (e) => {
      if (e.target.checked) {
        visibleItems().forEach((r) => ui.selected.add(r.report_name));
      } else {
        ui.selected.clear();
      }
      render(el);
    };
    el.querySelector("#rl-batch-del").onclick = () => batchDelete(el);
    await loadList(el);
  }

  async function loadList(el) {
    const box = el.querySelector("#report-table");
    try {
      const { items, total } = await DVApi.list(
        `/api/reports?page=${page}&page_size=${PAGE_SIZE}`);
      lastItems = items;
      lastTotal = total;
      render(el);
    } catch (e) {
      box.innerHTML =
        `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  function visibleItems() {
    let items = lastItems.slice();
    if (ui.profileFilter !== "all") {
      items = items.filter((r) =>
        (r.report_profile || "balanced") === ui.profileFilter);
    }
    if (ui.query) {
      const q = ui.query.toLowerCase();
      items = items.filter((r) =>
        (r.topic || "").toLowerCase().includes(q) ||
        (r.report_name || "").toLowerCase().includes(q));
    }
    return items;
  }

  function render(el) {
    const box = el.querySelector("#report-table");
    if (!box) return;
    const items = visibleItems();
    const selCount = el.querySelector("#rl-sel-count");
    if (selCount) {
      selCount.textContent =
        ui.selected.size ? `已选 ${ui.selected.size} 项` : "";
    }
    if (!items.length) {
      box.innerHTML = lastItems.length
        ? '<div class="empty">没有匹配的报告</div>'
        : '<div class="empty">暂无报告 — 完成一次访谈后生成</div>';
      renderPager(el);
      return;
    }
    let html = "";
    items.forEach((r) => {
      const name = DVMarkdown.esc(r.report_name);
      const checked = ui.selected.has(r.report_name) ? "checked" : "";
      const profile = r.report_profile || "balanced";
      html += `<div class="session-row" data-rname="${name}">
        ${ui.batchMode
          ? `<input type="checkbox" class="rl-pick" data-pick="${name}" ${checked}>`
          : ""}
        <div class="session-main clickable" data-open="${name}">
          <div class="session-title">${DVMarkdown.esc(shortName(r.report_name))}
            <span class="badge">${DVMarkdown.esc(
              PROFILE_LABELS[profile] || profile)}</span>
            ${r.report_variant_label
              ? `<span class="badge warn">${DVMarkdown.esc(r.report_variant_label)}</span>`
              : ""}</div>
          <div class="session-meta muted">
            ${DVMarkdown.esc(r.topic || "")} · ${fmtTime(r.created_at)}
            ${r.source_report_name
              ? ` · 派生自 ${DVMarkdown.esc(shortName(r.source_report_name))}`
              : ""}</div>
        </div>
        <div class="session-actions">
          ${r.session_id
            ? `<button class="small ghost" data-session="${DVMarkdown.esc(r.session_id)}">访谈</button>`
            : ""}
          <button class="small ghost" data-solution="${name}">方案页</button>
          ${!ui.batchMode
            ? `<button class="small ghost" style="color:var(--err)"
                data-del="${name}">删除</button>` : ""}
        </div></div>`;
    });
    box.innerHTML = html;

    box.querySelectorAll("[data-open]").forEach((n) => {
      n.onclick = () => {
        if (ui.batchMode) {
          togglePick(el, n.closest(".session-row").dataset.rname);
          return;
        }
        const row = lastItems.find(
          (r) => r.report_name === n.dataset.open);
        DV.show("report", row || n.dataset.open);
      };
    });
    box.querySelectorAll("[data-session]").forEach((n) => {
      n.onclick = (e) => {
        e.stopPropagation();
        DV.show("interview", n.dataset.session);
      };
    });
    box.querySelectorAll("[data-solution]").forEach((n) => {
      n.onclick = (e) => {
        e.stopPropagation();
        window.open(
          `/solution.html?report=${encodeURIComponent(n.dataset.solution)}`,
          "_blank");
      };
    });
    box.querySelectorAll("[data-del]").forEach((n) => {
      n.onclick = async (e) => {
        e.stopPropagation();
        if (!confirm("确认删除该报告？")) return;
        try {
          await DVApi.del(`/api/reports/${encodeURIComponent(n.dataset.del)}`);
          DV.toast("已删除", "ok");
        } catch (err) {
          DV.toast(err.message, "err");
        }
        loadList(el);
      };
    });
    box.querySelectorAll(".rl-pick").forEach((n) => {
      n.onchange = () => togglePick(el, n.dataset.pick);
    });
    renderPager(el);
  }

  function togglePick(el, name) {
    if (ui.selected.has(name)) ui.selected.delete(name);
    else ui.selected.add(name);
    render(el);
  }

  async function batchDelete(el) {
    const names = Array.from(ui.selected);
    if (!names.length) { DV.toast("请先勾选要删除的报告", "warn"); return; }
    if (!confirm(`确认删除选中的 ${names.length} 份报告？`)) return;
    try {
      const { body } = await DVApi.post("/api/reports/batch-delete",
        { report_names: names });
      DV.toast(`已删除 ${(body.deleted || []).length} 份报告`, "ok");
    } catch (e) {
      DV.toast(e.message, "err");
    }
    ui.selected.clear();
    loadList(el);
  }

  function renderPager(el) {
    const pages = Math.max(1, Math.ceil(lastTotal / PAGE_SIZE));
    const pager = el.querySelector("#report-pager");
    pager.innerHTML = `
      <button class="small secondary" id="rp-prev" ${page <= 1 ? "disabled" : ""}>上一页</button>
      <span class="muted">第 ${page} / ${pages} 页 · 共 ${lastTotal} 条</span>
      <button class="small secondary" id="rp-next" ${page >= pages ? "disabled" : ""}>下一页</button>`;
    pager.querySelector("#rp-prev").onclick = () => {
      page--; ui.selected.clear(); loadList(el);
    };
    pager.querySelector("#rp-next").onclick = () => {
      page++; ui.selected.clear(); loadList(el);
    };
  }

  function shortName(name) {
    return (name || "").replace(/\.md$/, "").slice(0, 48);
  }
  function fmtTime(t) {
    return (t || "").replace("T", " ").replace(/Z|\.\d+.*/, "");
  }

  // ---- detail view ----------------------------------------------------
  let presTimer = null;
  let regenTimer = null;

  async function mountDetail(el, arg) {
    // arg is a report-index row (from the list) or a bare report_name
    // string (from interview completion / deep links)
    const meta = typeof arg === "object" && arg ? arg : {};
    const reportName = meta.report_name || String(arg || "");
    const enc = encodeURIComponent(reportName);

    el.innerHTML = `
      <div class="row between">
        <button class="small secondary" id="rd-back">← 报告列表</button>
        <div class="row" id="rd-actions">
          <button class="small secondary" data-fmt="markdown">导出 MD</button>
          <button class="small secondary" data-fmt="docx">导出 Word</button>
          <button class="small secondary" data-fmt="pdf">导出 PDF</button>
          <button class="small secondary" id="rd-appendix">附录 PDF</button>
          <button class="small ghost" id="rd-history">导出记录</button>
          <button class="small secondary" id="rd-pres">演示稿</button>
          ${meta.session_id
            ? '<button class="small secondary" id="rd-regen">重新生成</button>'
            : ""}
          <button class="small" id="rd-solution">方案页</button>
          <button class="small secondary" id="rd-share">分享方案</button>
        </div>
      </div>
      <div class="report-layout" style="margin-top:14px">
        <nav class="card report-toc" id="rd-toc" style="display:none"></nav>
        <div class="card grow">
          <div id="rd-body"><div class="thinking">
            <div class="spinner"></div>加载报告…</div></div>
        </div>
      </div>`;
    el.querySelector("#rd-back").onclick = () => DV.show("reports");
    el.querySelector("#rd-solution").onclick = () => window.open(
      `/solution.html?report=${enc}`, "_blank");
    el.querySelector("#rd-share").onclick = () => shareSolution(reportName);
    el.querySelector("#rd-appendix").onclick = () =>
      window.open(`/api/reports/${enc}/appendix/pdf`, "_blank");
    el.querySelector("#rd-pres").onclick = () => presentation(reportName);
    el.querySelector("#rd-history").onclick = () => exportHistory(reportName);
    const regenBtn = el.querySelector("#rd-regen");
    if (regenBtn) regenBtn.onclick = () => regenerate(meta);
    el.querySelectorAll("[data-fmt]").forEach((b) => {
      b.onclick = () => doExport(reportName, b.dataset.fmt, b);
    });

    try {
      const { body } = await DVApi.get(`/api/reports/${enc}`);
      const md = typeof body === "string" ? body : (body.content || "");
      el.querySelector("#rd-body").innerHTML = DVMarkdown.render(md);
      buildToc(el);
    } catch (e) {
      el.querySelector("#rd-body").innerHTML =
        `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  // TOC sidebar from the rendered h1/h2/h3 (reference report detail's
  // chapter navigation)
  function buildToc(el) {
    const body = el.querySelector("#rd-body");
    const toc = el.querySelector("#rd-toc");
    const heads = body.querySelectorAll("h1, h2, h3");
    if (heads.length < 3) return;
    let html = '<div class="toc-title">目录</div>';
    heads.forEach((h, i) => {
      h.id = `rd-h-${i}`;
      const lvl = Number(h.tagName[1]);
      html += `<a class="toc-item lvl${lvl}" href="#rd-h-${i}">
        ${DVMarkdown.esc(h.textContent.slice(0, 40))}</a>`;
    });
    toc.innerHTML = html;
    toc.style.display = "";
    toc.querySelectorAll("a").forEach((a) => {
      a.onclick = (e) => {
        e.preventDefault();
        const t = body.querySelector(a.getAttribute("href"));
        if (t) t.scrollIntoView({ behavior: "smooth", block: "start" });
      };
    });
    // scroll-spy: highlight the chapter in view (same pattern as the
    // solution page; executes in CI through the minijs IO shim)
    if ("IntersectionObserver" in window) {
      const links = Array.from(toc.querySelectorAll("a.toc-item"));
      const byHref = {};
      links.forEach((a) => { byHref[a.getAttribute("href")] = a; });
      const io = new IntersectionObserver((entries) => {
        entries.forEach((en) => {
          const link = byHref["#" + en.target.id];
          if (link && en.isIntersecting) {
            links.forEach((l) => l.classList.remove("active"));
            link.classList.add("active");
          }
        });
      }, { rootMargin: "-15% 0px -75% 0px" });
      heads.forEach((h) => io.observe(h));
    }
  }

  function unmountDetail() {
    clearInterval(presTimer);
    clearInterval(regenTimer);
  }

  async function doExport(reportName, fmt, btn) {
    btn.disabled = true;
    try {
      const { body } = await DVApi.post(
        `/api/reports/${encodeURIComponent(reportName)}/exports`,
        { format: fmt });
      window.open(
        `/api/reports/${encodeURIComponent(reportName)}/exports/${body.asset_id}`,
        "_blank");
    } catch (e) {
      DV.toast(e.message, "err");
    } finally {
      btn.disabled = false;
    }
  }

  // past export assets (export_asset_store; reference keeps an export
  // history per report)
  async function exportHistory(reportName) {
    const enc = encodeURIComponent(reportName);
    try {
      const { body } = await DVApi.get(`/api/reports/${enc}/exports`);
      const rows = body || [];
      const list = rows.length
        ? rows.map((a) => `
            <div class="row between" style="padding:6px 0;
                border-bottom:1px solid var(--border)">
              <span><span class="badge">${DVMarkdown.esc(a.format)}</span>
                ${DVMarkdown.esc(a.filename || a.asset_id)}</span>
              <span class="row">
                <span class="muted">${fmtTime(a.created_at)}</span>
                <a class="small" target="_blank"
                  href="/api/reports/${enc}/exports/${DVMarkdown.esc(a.asset_id)}">下载</a>
              </span></div>`).join("")
        : '<div class="empty">暂无导出记录</div>';
      DV.modal(`<h2>导出记录</h2>${list}`);
    } catch (e) {
      DV.toast(e.message, "err");
    }
  }

  // regenerate from the source session with a chosen profile (level-gated
  // server-side; reference regenerate-with-profile flow)
  function regenerate(meta) {
    const caps = (DV.state.user && DV.state.user.capabilities) || {};
    const allowed = caps.report_profiles || ["balanced"];
    const m = DV.modal(`
      <h2>重新生成报告</h2>
      <p class="muted">基于原访谈记录重新运行报告管线。</p>
      <div class="row" id="rg-profiles"></div>
      <div class="error-text" id="rg-err"></div>
      <div class="row" style="margin-top:14px">
        <button id="rg-go" class="grow">开始生成</button>
      </div>
      <p class="muted" id="rg-status"></p>`);
    let profile = allowed[0] || "balanced";
    const box = m.querySelector("#rg-profiles");
    ["balanced", "quality", "release-conservative"].forEach((p) => {
      const ok = allowed.includes(p);
      const b = document.createElement("button");
      b.className = "small " + (p === profile ? "" : "secondary");
      b.textContent = (PROFILE_LABELS[p] || p) + (ok ? "" : " 🔒");
      b.disabled = !ok;
      b.onclick = () => {
        profile = p;
        box.querySelectorAll("button").forEach((x) =>
          x.classList.add("secondary"));
        b.classList.remove("secondary");
      };
      box.appendChild(b);
    });
    m.querySelector("#rg-go").onclick = async () => {
      const err = m.querySelector("#rg-err");
      const status = m.querySelector("#rg-status");
      try {
        await DVApi.post(
          `/api/sessions/${meta.session_id}/generate-report`,
          { profile, force: true });
        m.querySelector("#rg-go").disabled = true;
        status.textContent = "已提交，生成中…";
        clearInterval(regenTimer);
        regenTimer = setInterval(async () => {
          try {
            const { body: st } = await DVApi.get(
              `/api/status/report-generation/${meta.session_id}`);
            status.textContent = `阶段 ${(st.stage_index || 0) + 1}/` +
              `${st.total_stages || "?"}：${st.stage_label || st.state || "…"}` +
              (st.message ? ` — ${st.message}` : "");
            if (st.state === "completed") {
              clearInterval(regenTimer);
              DV.toast("新报告已生成", "ok");
              DV.closeModal();
              if (st.report_name) DV.show("report", st.report_name);
              else DV.show("reports");
            } else if (st.state === "failed") {
              clearInterval(regenTimer);
              status.textContent = `生成失败：${st.error || ""}`;
            }
          } catch (e) { /* transient poll error */ }
        }, 2500);
      } catch (e) {
        err.textContent = e.message;
      }
    };
  }

  async function shareSolution(reportName) {
    try {
      const { body } = await DVApi.post(
        `/api/reports/${encodeURIComponent(reportName)}/solution/share`, {});
      const url = `${location.origin}/solution.html?share=${body.share_token}`;
      const m = DV.modal(`
        <h2>方案分享链接</h2>
        <input readonly value="${DVMarkdown.esc(url)}" id="share-url">
        <div class="row" style="margin-top:10px">
          <button id="share-copy">复制链接</button>
        </div>`);
      m.querySelector("#share-copy").onclick = () => {
        const inp = m.querySelector("#share-url");
        inp.select();
        document.execCommand("copy");
        DV.toast("已复制", "ok");
      };
    } catch (e) {
      DV.toast(e.message, "err");
    }
  }

  // ---- presentation (Refly chain; reference report_detail_runtime.js) --
  async function presentation(reportName) {
    const enc = encodeURIComponent(reportName);
    const m = DV.modal(`
      <h2>AI 演示稿</h2>
      <p class="muted" id="pres-msg">查询状态…</p>
      <div class="row">
        <button id="pres-start">生成演示稿</button>
        <button class="secondary" id="pres-get" disabled>下载 PDF</button>
        <button class="secondary" id="pres-abort" disabled>中止</button>
      </div>`);
    const msg = m.querySelector("#pres-msg");
    const btnGet = m.querySelector("#pres-get");
    const btnAbort = m.querySelector("#pres-abort");

    async function poll() {
      try {
        const { body: st } = await DVApi.get(
          `/api/reports/${enc}/presentation/status`);
        msg.textContent = `状态：${st.state || "none"} ${st.detail || ""}`;
        btnGet.disabled = st.state !== "completed";
        btnAbort.disabled = !(st.state === "running" || st.state === "queued");
        if (st.state === "completed" || st.state === "failed") {
          clearInterval(presTimer);
        }
      } catch (e) {
        msg.textContent = e.message;
      }
    }
    m.querySelector("#pres-start").onclick = async () => {
      try {
        await DVApi.post(`/api/reports/${enc}/refly`, {});
        DV.toast("已提交演示稿任务", "ok");
        clearInterval(presTimer);
        presTimer = setInterval(poll, 3000);
      } catch (e) { msg.textContent = e.message; }
    };
    btnGet.onclick = () => window.open(
      `/api/reports/${enc}/presentation`, "_blank");
    btnAbort.onclick = async () => {
      await DVApi.post(`/api/reports/${enc}/presentation/abort`, {});
      poll();
    };
    poll();
  }

  DV.registerView("reports", { mount: mountList });
  DV.registerView("report", { mount: mountDetail, unmount: unmountDetail });
})();
