/* Session list + new-interview flow (scenario picker, interview mode).
   Re-implements reference web/app_modules/session_list_state.js (670 LoC:
   paging + ETag revalidation, search/status filters, date grouping, batch
   management mode, report badges, auto-refresh) and the new-session form
   in web/index.html. */
(function () {
  "use strict";

  let page = 1;
  const PAGE_SIZE = 20;

  // view state (persists across mounts within a browser session)
  const ui = {
    query: "",
    statusFilter: "all",     // all | in_progress | completed
    sortBy: "updated_at",    // updated_at | created_at (client-side)
    batchMode: false,
    selected: new Set(),     // session_ids picked in batch mode
  };
  let refreshTimer = null;
  let lastItems = [];
  let lastTotal = 0;

  async function mount(el) {
    el.innerHTML = `
      <div class="row between">
        <h2 style="margin:0">我的访谈</h2>
        <div class="row">
          <button class="small secondary" id="batch-btn">批量管理</button>
          <button id="new-session-btn">＋ 新建访谈</button>
        </div>
      </div>
      <div class="card" style="margin-top:14px">
        <div class="row list-toolbar" id="session-toolbar">
          <input id="sl-search" placeholder="搜索主题 / 场景…"
            style="flex:1;min-width:160px">
          <div class="row" id="sl-status-chips"></div>
          <select id="sl-sort">
            <option value="updated_at">最近更新</option>
            <option value="created_at">创建时间</option>
          </select>
        </div>
        <div class="row" id="sl-batch-bar" style="display:none;margin:8px 0">
          <label class="row" style="gap:6px">
            <input type="checkbox" id="sl-select-all"> 全选本页</label>
          <span class="muted" id="sl-sel-count"></span>
          <button class="small" id="sl-batch-del"
            style="color:var(--err)">删除所选</button>
        </div>
        <div id="session-table">
          <div class="skeleton-row"><div class="skeleton"></div>
            <div class="skeleton grow"></div><div class="skeleton"></div></div>
          <div class="skeleton-row"><div class="skeleton"></div>
            <div class="skeleton grow"></div><div class="skeleton"></div></div>
          <div class="skeleton-row"><div class="skeleton"></div>
            <div class="skeleton grow"></div><div class="skeleton"></div></div>
        </div>
        <div class="pager" id="session-pager"></div>
      </div>`;

    el.querySelector("#new-session-btn").onclick = () => {
      if (DV.requireLogin()) showNewSession();
    };
    el.querySelector("#batch-btn").onclick = () => {
      ui.batchMode = !ui.batchMode;
      ui.selected.clear();
      el.querySelector("#batch-btn").classList.toggle(
        "secondary", !ui.batchMode);
      el.querySelector("#sl-batch-bar").style.display =
        ui.batchMode ? "" : "none";
      render(el);
    };

    // toolbar wiring
    const search = el.querySelector("#sl-search");
    search.value = ui.query;
    let debounce = null;
    search.oninput = () => {
      clearTimeout(debounce);
      debounce = setTimeout(() => {
        ui.query = search.value.trim();
        render(el);
      }, 150);
    };
    const chips = el.querySelector("#sl-status-chips");
    [["all", "全部"], ["in_progress", "进行中"],
     ["completed", "已完成"]].forEach(([val, label]) => {
      const b = document.createElement("button");
      b.className = "small " + (ui.statusFilter === val ? "" : "secondary");
      b.textContent = label;
      b.onclick = () => {
        ui.statusFilter = val;
        chips.querySelectorAll("button").forEach((x) =>
          x.classList.add("secondary"));
        b.classList.remove("secondary");
        render(el);
      };
      chips.appendChild(b);
    });
    const sortSel = el.querySelector("#sl-sort");
    sortSel.value = ui.sortBy;
    sortSel.onchange = () => { ui.sortBy = sortSel.value; render(el); };

    // batch bar wiring
    el.querySelector("#sl-select-all").onchange = (e) => {
      if (e.target.checked) {
        visibleItems().forEach((s) => ui.selected.add(s.session_id));
      } else {
        ui.selected.clear();
      }
      render(el);
    };
    el.querySelector("#sl-batch-del").onclick = () => batchDelete(el);

    if (!DV.state.user) {
      el.querySelector("#session-table").innerHTML =
        '<div class="empty">请先登录后查看访谈列表</div>';
      return;
    }
    await load(el);
    // ETag-backed auto-refresh (reference polls list with If-None-Match;
    // 304 keeps the cached render)
    refreshTimer = setInterval(async () => {
      if (!DV.state.user || !document.getElementById("session-table")) return;
      try {
        const r = await DVApi.list(
          `/api/sessions?page=${page}&page_size=${PAGE_SIZE}`);
        if (!r.cached) {
          lastItems = r.items;
          lastTotal = r.total;
          render(el);
        }
      } catch (e) { /* transient refresh errors are non-fatal */ }
    }, 20000);
  }

  function unmount() {
    if (refreshTimer) { clearInterval(refreshTimer); refreshTimer = null; }
  }

  async function load(el) {
    const box = el.querySelector("#session-table");
    try {
      const { items, total } = await DVApi.list(
        `/api/sessions?page=${page}&page_size=${PAGE_SIZE}`);
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
    if (ui.statusFilter !== "all") {
      items = items.filter((s) => (s.status || "in_progress") ===
        ui.statusFilter);
    }
    if (ui.query) {
      const q = ui.query.toLowerCase();
      items = items.filter((s) =>
        (s.topic || "").toLowerCase().includes(q) ||
        (s.scenario_id || "").toLowerCase().includes(q));
    }
    if (ui.sortBy === "created_at") {
      items.sort((a, b) => String(b.created_at || "")
        .localeCompare(String(a.created_at || "")));
    }
    return items;
  }

  // 今天 / 昨天 / 七天内 / 更早 buckets keyed on the active sort column
  function dateGroup(s) {
    const t = s[ui.sortBy] || s.updated_at;
    if (!t) return "更早";
    const d = new Date(String(t).replace(" ", "T"));
    if (isNaN(d)) return "更早";
    const now = new Date();
    const midnight = new Date(now.getFullYear(), now.getMonth(),
      now.getDate());
    const days = (midnight - d) / 86400000;
    if (days < 1) return "今天";
    if (days < 2) return "昨天";
    if (days < 7) return "七天内";
    return "更早";
  }

  function coverageBar(s) {
    let dims = {};
    try { dims = JSON.parse(s.dimensions_json || "{}") || {}; } catch (e) {}
    const vals = Object.values(dims)
      .map((d) => Number(d && d.coverage) || 0);
    if (!vals.length) return "";
    const avg = vals.reduce((a, b) => a + b, 0) / vals.length;
    const pct = Math.round(Math.min(1, avg) * 100);
    return `<div class="mini-bar" title="维度覆盖 ${pct}%">
      <div class="mini-bar-fill" style="width:${pct}%"></div></div>`;
  }

  function render(el) {
    const box = el.querySelector("#session-table");
    if (!box) return;
    const items = visibleItems();
    const selCount = el.querySelector("#sl-sel-count");
    if (selCount) {
      selCount.textContent =
        ui.selected.size ? `已选 ${ui.selected.size} 项` : "";
    }
    if (!items.length) {
      box.innerHTML = lastItems.length
        ? '<div class="empty">没有匹配的访谈</div>'
        : '<div class="empty">暂无访谈，点击右上角新建</div>';
      renderPager(el);
      return;
    }

    let html = "";
    let lastGroup = null;
    items.forEach((s) => {
      const g = dateGroup(s);
      if (g !== lastGroup && !ui.query) {
        html += `<div class="list-group">${g}</div>`;
        lastGroup = g;
      }
      const sid = DVMarkdown.esc(s.session_id);
      const done = s.status === "completed";
      const status = done
        ? '<span class="badge ok">已完成</span>'
        : '<span class="badge info">进行中</span>';
      const reportName = s.current_report_name || s.last_report_name;
      const checked = ui.selected.has(s.session_id) ? "checked" : "";
      html += `<div class="session-row" data-sid="${sid}">
        ${ui.batchMode
          ? `<input type="checkbox" class="sl-pick" data-pick="${sid}" ${checked}>`
          : ""}
        <div class="session-main clickable" data-open="${sid}">
          <div class="session-title">${DVMarkdown.esc(s.topic || "(无主题)")}
            ${s.scenario_id
              ? `<span class="badge">${DVMarkdown.esc(s.scenario_id)}</span>`
              : ""}</div>
          <div class="session-meta muted">
            ${status} · ${DVMarkdown.esc(modeLabel(s.interview_mode))}
            · ${s.interview_count || 0} 轮
            · ${fmtTime(s[ui.sortBy] || s.updated_at)}</div>
          ${coverageBar(s)}
        </div>
        <div class="session-actions">
          ${!done
            ? `<button class="small" data-open="${sid}">继续</button>` : ""}
          ${reportName
            ? `<button class="small ghost" data-report="${DVMarkdown.esc(reportName)}">报告</button>`
            : ""}
          ${!ui.batchMode
            ? `<button class="small ghost" data-del="${sid}"
                style="color:var(--err)">删除</button>` : ""}
        </div></div>`;
    });
    box.innerHTML = html;

    box.querySelectorAll("[data-open]").forEach((n) => {
      n.onclick = (e) => {
        if (ui.batchMode && n.classList.contains("session-main")) {
          togglePick(el, n.closest(".session-row").dataset.sid);
          e.stopPropagation();
          return;
        }
        DV.show("interview", n.dataset.open);
      };
    });
    box.querySelectorAll("[data-report]").forEach((n) => {
      n.onclick = (e) => {
        e.stopPropagation();
        DV.show("report", n.dataset.report);
      };
    });
    box.querySelectorAll("[data-del]").forEach((n) => {
      n.onclick = async (e) => {
        e.stopPropagation();
        if (!confirm("确认删除该访谈？")) return;
        try {
          await DVApi.del(`/api/sessions/${n.dataset.del}`);
          DV.toast("已删除", "ok");
        } catch (err) {
          DV.toast(err.message, "err");
        }
        load(el);
      };
    });
    box.querySelectorAll(".sl-pick").forEach((n) => {
      n.onchange = () => togglePick(el, n.dataset.pick);
    });
    renderPager(el);
  }

  function togglePick(el, sid) {
    if (ui.selected.has(sid)) ui.selected.delete(sid);
    else ui.selected.add(sid);
    render(el);
  }

  async function batchDelete(el) {
    const ids = Array.from(ui.selected);
    if (!ids.length) { DV.toast("请先勾选要删除的访谈", "warn"); return; }
    const withReports = confirm(
      `删除选中的 ${ids.length} 个访谈。\n\n` +
      "【确定】同时删除关联报告；【取消】则继续询问是否仅删访谈");
    if (!withReports &&
        !confirm(`仅删除 ${ids.length} 个访谈（保留报告）？`)) return;
    try {
      const { body } = await DVApi.post("/api/sessions/batch-delete",
        { session_ids: ids, delete_reports: withReports });
      const n = (body.deleted || []).length;
      const nr = (body.deleted_reports || []).length;
      DV.toast(nr ? `已删除 ${n} 个访谈、${nr} 份报告` : `已删除 ${n} 个访谈`,
               "ok");
    } catch (e) {
      DV.toast(e.message, "err");
    }
    ui.selected.clear();
    load(el);
  }

  function renderPager(el) {
    const pages = Math.max(1, Math.ceil(lastTotal / PAGE_SIZE));
    const pager = el.querySelector("#session-pager");
    pager.innerHTML = `
      <button class="small secondary" id="pg-prev" ${page <= 1 ? "disabled" : ""}>上一页</button>
      <span class="muted">第 ${page} / ${pages} 页 · 共 ${lastTotal} 条</span>
      <button class="small secondary" id="pg-next" ${page >= pages ? "disabled" : ""}>下一页</button>`;
    pager.querySelector("#pg-prev").onclick = () => {
      page--; ui.selected.clear(); load(el);
    };
    pager.querySelector("#pg-next").onclick = () => {
      page++; ui.selected.clear(); load(el);
    };
  }

  function modeLabel(m) {
    return { quick: "快速", standard: "标准", deep: "深度" }[m] || m || "标准";
  }
  function fmtTime(t) {
    if (!t) return "";
    return String(t).replace("T", " ").replace(/Z|\.\d+.*/, "");
  }

  // ---- new session -------------------------------------------------
  async function showNewSession() {
    let scenarios = [];
    try {
      scenarios = (await DVApi.get("/api/scenarios")).body || [];
    } catch (e) { /* scenario list optional */ }
    const caps = (DV.state.user && DV.state.user.capabilities) || {};
    const modes = caps.interview_modes || ["quick"];

    const m = DV.modal(`
      <h2>新建访谈</h2>
      <label class="field">访谈主题（必填）
        <input id="ns-topic" placeholder="例如：电商平台会员体系升级"></label>
      <label class="field">补充说明
        <textarea id="ns-desc" rows="2" placeholder="项目背景、目标（可选）"></textarea></label>
      <h3>访谈场景</h3>
      <div class="scenario-grid" id="ns-scenarios"></div>
      <div class="row" style="margin:10px 0">
        <button class="small ghost" id="ns-gen">✨ AI 根据描述生成场景</button>
      </div>
      <h3>访谈模式</h3>
      <div class="row" id="ns-modes"></div>
      <div class="error-text" id="ns-err"></div>
      <div class="row" style="margin-top:14px">
        <button id="ns-create" class="grow">开始访谈</button>
      </div>`);

    let selScenario = "product-requirement";
    let selMode = modes[0];

    const grid = m.querySelector("#ns-scenarios");
    (scenarios.length ? scenarios : [{ id: "product-requirement",
      name: "产品需求调研", description: "" }]).forEach((s) => {
      const c = document.createElement("div");
      c.className = "scenario-card" + (s.id === selScenario ? " selected" : "");
      c.innerHTML = `<div class="name">${DVMarkdown.esc(s.name || s.id)}</div>
        <div class="desc">${DVMarkdown.esc((s.description || "").slice(0, 60))}</div>`;
      c.onclick = () => {
        selScenario = s.id;
        grid.querySelectorAll(".scenario-card").forEach((x) =>
          x.classList.remove("selected"));
        c.classList.add("selected");
      };
      grid.appendChild(c);
    });

    const modeBox = m.querySelector("#ns-modes");
    ["quick", "standard", "deep"].forEach((mode) => {
      const allowed = modes.includes(mode);
      const b = document.createElement("button");
      b.className = "small " + (mode === selMode ? "" : "secondary");
      b.textContent = modeLabel(mode) + (allowed ? "" : " 🔒");
      b.disabled = !allowed;
      b.onclick = () => {
        selMode = mode;
        modeBox.querySelectorAll("button").forEach((x) =>
          x.classList.add("secondary"));
        b.classList.remove("secondary");
      };
      modeBox.appendChild(b);
    });

    m.querySelector("#ns-gen").onclick = async () => {
      const desc = m.querySelector("#ns-desc").value.trim() ||
                   m.querySelector("#ns-topic").value.trim();
      if (!desc) { DV.toast("请先填写主题或描述", "warn"); return; }
      m.querySelector("#ns-gen").disabled = true;
      try {
        const { body } = await DVApi.post("/api/scenarios/generate",
          { description: desc });
        if (body && body.id) {
          selScenario = body.id;
          DV.toast(`已生成场景：${body.name || body.id}`, "ok");
        }
      } catch (e) {
        DV.toast(e.message, "err");
      } finally {
        m.querySelector("#ns-gen").disabled = false;
      }
    };

    m.querySelector("#ns-create").onclick = async () => {
      const topic = m.querySelector("#ns-topic").value.trim();
      const err = m.querySelector("#ns-err");
      if (!topic) { err.textContent = "请填写访谈主题"; return; }
      try {
        const { body } = await DVApi.post("/api/sessions", {
          topic,
          description: m.querySelector("#ns-desc").value.trim(),
          scenario_id: selScenario,
          interview_mode: selMode,
        });
        DV.closeModal();
        DV.show("interview", body.session_id);
      } catch (e) {
        err.textContent = e.message;
      }
    };
  }

  DV.registerView("sessions", { mount, unmount });
})();
