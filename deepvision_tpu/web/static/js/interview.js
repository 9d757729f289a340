/* Interview runtime: next-question with AbortController + the reference's
   watchdog semantics — soft 30s idle recovery, hard 90s abort
   (reference web/app.js:13-14, app_modules/interview_runtime.js:150-185),
   thinking/web-search liveness polling, answer modes, doc upload,
   assistant chat, readiness gate -> report generation. */
(function () {
  "use strict";

  const SOFT_TIMEOUT_MS = 30000;   // reference QUESTION_SOFT_TIMEOUT
  const HARD_TIMEOUT_MS = 90000;   // reference QUESTION_HARD_TIMEOUT

  let sessionId = null;
  let session = null;
  let current = null;        // current question payload
  let root = null;
  let abortCtl = null;
  let pollTimer = null;
  let softTimer = null;
  let hardTimer = null;
  let lastLiveness = "";
  let selected = new Set();

  async function mount(el, sid) {
    root = el;
    sessionId = sid || sessionId;
    if (!sessionId) { DV.show("sessions"); return; }
    el.innerHTML = `
      <div class="row between">
        <button class="small secondary" id="iv-back">← 返回列表</button>
        <div class="row">
          <button class="small secondary" id="iv-docs-btn">📎 参考资料</button>
          <button class="small secondary" id="iv-chat-btn">💬 访谈助手</button>
          <button class="small secondary" id="iv-restart">重新开始</button>
          <button class="small" id="iv-report-btn">生成报告</button>
        </div>
      </div>
      <div class="card" style="margin-top:14px">
        <div class="row between">
          <div><h2 id="iv-topic" style="margin:0"></h2>
            <span class="muted" id="iv-mode"></span></div>
          <div style="min-width:220px">
            <div class="muted" id="iv-progress-label" style="text-align:right"></div>
            <div class="progress-track"><div class="progress-bar" id="iv-progress" style="width:0%"></div></div>
          </div>
        </div>
        <div class="row" id="iv-dims" style="margin-top:10px;flex-wrap:wrap"></div>
      </div>
      <div class="card" id="iv-question-card"></div>
      <div class="card" id="iv-extra" style="display:none"></div>
      <div class="card"><h3 style="margin-top:0">已回答</h3>
        <div class="qa-log" id="iv-log"></div></div>`;

    el.querySelector("#iv-back").onclick = () => DV.show("sessions");
    el.querySelector("#iv-report-btn").onclick = generateReport;
    el.querySelector("#iv-docs-btn").onclick = showDocs;
    el.querySelector("#iv-chat-btn").onclick = showChat;
    el.querySelector("#iv-restart").onclick = async () => {
      if (!confirm("重新开始将清空问答记录（会保留备份），确认？")) return;
      await DVApi.post(`/api/sessions/${sessionId}/restart-interview`, {});
      await refreshSession();
      nextQuestion();
    };

    await refreshSession();
    nextQuestion();
  }

  function unmount() {
    stopWatchdog();
    if (abortCtl) abortCtl.abort();
  }

  async function refreshSession() {
    const { body } = await DVApi.get(`/api/sessions/${sessionId}`);
    session = body;
    root.querySelector("#iv-topic").textContent = session.topic || "";
    root.querySelector("#iv-mode").textContent =
      `${modeLabel(session.interview_mode)}模式 · ` +
      `${(session.scenario_config || {}).name || session.scenario_id || ""}`;
    renderProgress();
    renderLog();
  }

  function modeLabel(m) {
    return { quick: "快速", standard: "标准", deep: "深度" }[m] || "标准";
  }

  function renderProgress() {
    const dims = (session.scenario_config || {}).dimensions || [];
    const state = session.dimensions || {};
    let done = 0;
    dims.forEach((d) => {
      if ((state[d.id] || {}).coverage >= 1) done++;
    });
    const total = Math.max(dims.length, 1);
    const answered = (session.interview_log || []).length;
    root.querySelector("#iv-progress").style.width =
      `${Math.min(100, Math.round((done / total) * 100))}%`;
    root.querySelector("#iv-progress-label").textContent =
      `维度 ${done}/${total} · 已答 ${answered} 题`;
    renderDimChips();
  }

  // per-dimension coverage chips; click to inspect / force-complete
  // (reference dimension panel + complete-dimension action)
  function renderDimChips() {
    const box = root.querySelector("#iv-dims");
    if (!box) return;
    const dims = (session.scenario_config || {}).dimensions || [];
    const state = session.dimensions || {};
    box.innerHTML = "";
    dims.forEach((d) => {
      const st = state[d.id] || {};
      const pct = Math.round(Math.min(1, st.coverage || 0) * 100);
      const chip = document.createElement("button");
      chip.className = "small " + (st.completed ? "" : "secondary");
      chip.textContent = `${d.name || d.id} ${st.completed ? "✓" : pct + "%"}`;
      chip.title = st.completed ? "已完成" : `覆盖度 ${pct}%，点击查看`;
      chip.onclick = () => dimDetail(d, st);
      box.appendChild(chip);
    });
  }

  function dimDetail(d, st) {
    const items = (st.items || []).slice(-6).map((it) =>
      `<li class="muted">${DVMarkdown.esc(
        typeof it === "string" ? it : (it.summary || it.question || ""))}</li>`
    ).join("");
    const m = DV.modal(`
      <h2>${DVMarkdown.esc(d.name || d.id)}</h2>
      <p class="muted">${DVMarkdown.esc(d.description || "")}</p>
      <p>覆盖度：${Math.round(Math.min(1, st.coverage || 0) * 100)}%
        ${st.completed ? '<span class="badge ok">已完成</span>' : ""}</p>
      ${items ? `<ul>${items}</ul>` : ""}
      ${!st.completed
        ? '<div class="row"><button class="secondary" id="dim-done">标记该维度完成</button></div>'
        : ""}`);
    const btn = m.querySelector("#dim-done");
    if (btn) btn.onclick = async () => {
      if (!confirm("跳过该维度的剩余问题并标记完成？")) return;
      try {
        await DVApi.post(`/api/sessions/${sessionId}/complete-dimension`,
          { dimension: d.id });
        DV.closeModal();
        await refreshSession();
        nextQuestion();
      } catch (e) { DV.toast(e.message, "err"); }
    };
  }

  function renderLog() {
    const log = root.querySelector("#iv-log");
    const entries = session.interview_log || [];
    if (!entries.length) {
      log.innerHTML = '<div class="muted">还没有问答记录</div>';
      return;
    }
    log.innerHTML = entries.slice().reverse().map((e) => `
      <div class="qa">
        <div class="q">${DVMarkdown.esc(e.question || "")}</div>
        <div class="a">${DVMarkdown.esc(e.answer || "")}
          ${e.quality_score != null
            ? `<span class="badge">${Number(e.quality_score).toFixed(2)}</span>` : ""}
        </div>
      </div>`).join("");
  }

  // ---- watchdog (reference interview_runtime.js:150-185) -------------
  function startWatchdog(card) {
    stopWatchdog();
    lastLiveness = "";
    let softFired = false;
    const softFire = () => {
      softFired = true;
      const note = card.querySelector("#iv-soft-note");
      if (note) {
        note.innerHTML = `生成时间较长…
          <button class="small ghost" id="iv-retry-soft">重试</button>`;
        note.querySelector("#iv-retry-soft").onclick = () => {
          if (abortCtl) abortCtl.abort();
          nextQuestion();
        };
      }
    };
    softTimer = setTimeout(softFire, SOFT_TIMEOUT_MS);
    hardTimer = setTimeout(() => {
      if (abortCtl) abortCtl.abort();
      renderQuestionError(
        "生成超时（90s 硬阈值）。", true);
    }, HARD_TIMEOUT_MS);
    // liveness polling resets the soft timer whenever the server reports
    // stage progress (thinking status / web-search activity)
    pollTimer = setInterval(async () => {
      try {
        const [t, w] = await Promise.all([
          DVApi.get(`/api/status/thinking/${sessionId}`),
          DVApi.get("/api/status/web-search"),
        ]);
        const sig = JSON.stringify([t.body.stage, t.body.stage_index,
                                    w.body.active, w.body.query]);
        const stageEl = card.querySelector("#iv-stage");
        if (stageEl && t.body.active) {
          stageEl.textContent = t.body.message || t.body.stage || "思考中…";
        }
        if (stageEl && w.body.active) {
          stageEl.textContent = `联网检索：${w.body.query || ""}`;
        }
        if (sig !== lastLiveness && !softFired) {
          lastLiveness = sig;
          // server reported progress: push the soft deadline out, but
          // keep the RECOVERY behavior when it eventually fires (a
          // no-op re-arm here silently disabled the soft note)
          clearTimeout(softTimer);
          softTimer = setTimeout(softFire, SOFT_TIMEOUT_MS);
        }
      } catch (e) { /* liveness polling is best-effort */ }
    }, 2000);
  }

  function stopWatchdog() {
    clearTimeout(softTimer); clearTimeout(hardTimer); clearInterval(pollTimer);
    softTimer = hardTimer = pollTimer = null;
  }

  // ---- next question -------------------------------------------------
  async function nextQuestion() {
    const card = root.querySelector("#iv-question-card");
    card.innerHTML = `
      <div class="thinking"><div class="spinner"></div>
        <span id="iv-stage">AI 正在生成下一个问题…</span></div>
      <div class="muted" id="iv-soft-note"></div>`;
    abortCtl = new AbortController();
    startWatchdog(card);
    try {
      const { body } = await DVApi.post(
        `/api/sessions/${sessionId}/next-question`, {},
        { signal: abortCtl.signal });
      stopWatchdog();
      if (body.completed) {
        await refreshSession();
        renderDimensionDone(body);
        return;
      }
      current = body;
      selected = new Set();
      renderQuestion(body);
    } catch (e) {
      stopWatchdog();
      if (e.name === "AbortError") return;
      renderQuestionError(e.message, true);
    }
  }

  function renderQuestionError(msg, retry) {
    const card = root.querySelector("#iv-question-card");
    card.innerHTML = `
      <div class="error-text">${DVMarkdown.esc(msg)}</div>
      ${retry ? '<button class="small" id="iv-retry" style="margin-top:10px">重试</button>' : ""}`;
    const b = card.querySelector("#iv-retry");
    if (b) b.onclick = nextQuestion;
  }

  function renderDimensionDone(payload) {
    const card = root.querySelector("#iv-question-card");
    const dims = (session.scenario_config || {}).dimensions || [];
    const allDone = dims.every((d) =>
      ((session.dimensions || {})[d.id] || {}).coverage >= 1);
    card.innerHTML = `
      <h3 style="margin-top:0">✅ 维度「${DVMarkdown.esc(
        dimName(payload.dimension))}」已完成</h3>
      <p class="muted">${DVMarkdown.esc(payload.completion_reason || "")}</p>
      ${payload.quality_warning
        ? `<p class="error-text">${DVMarkdown.esc(payload.quality_warning)}</p>` : ""}
      <div class="row">
        ${allDone
          ? '<button id="iv-done-report">生成访谈报告</button>'
          : '<button id="iv-next-dim">继续下一维度</button>'}
      </div>`;
    const nb = card.querySelector("#iv-next-dim");
    if (nb) nb.onclick = nextQuestion;
    const rb = card.querySelector("#iv-done-report");
    if (rb) rb.onclick = generateReport;
  }

  function dimName(id) {
    const dims = (session.scenario_config || {}).dimensions || [];
    const d = dims.find((x) => x.id === id);
    return d ? d.name : id || "";
  }

  function renderQuestion(q) {
    const card = root.querySelector("#iv-question-card");
    const multi = !!q.multi_select;
    const needReason = q.answer_mode === "pick_with_reason";
    card.innerHTML = `
      <span class="dim-chip">${DVMarkdown.esc(dimName(q.dimension))}
        ${q.is_follow_up ? " · 追问" : ""}</span>
      <div class="question-text">${DVMarkdown.esc(q.question)}</div>
      <div class="muted">${multi ? "可多选" : "单选"}${needReason ? " · 请补充理由" : ""}
        ${q.ai_generated === false ? ' · <span class="badge warn">降级问题</span>' : ""}</div>
      <div id="iv-options"></div>
      ${(q.options || []).length
        ? `<button class="small ghost" id="iv-custom-toggle">✏️ 以上都不合适，自定义回答</button>
           <label class="field" id="iv-custom-box" style="display:none">自定义回答
             <textarea id="iv-custom" rows="2"
               placeholder="用自己的话描述实际情况"></textarea></label>`
        : ""}
      <label class="field" id="iv-reason-box" style="display:${needReason ? "block" : "none"}">
        补充说明${needReason ? "（必填）" : ""}
        <textarea id="iv-reason" rows="2"
          placeholder="结合实际情况补充背景、数据或原因"></textarea>
      </label>
      <div class="row" style="margin-top:10px">
        <button id="iv-submit">提交回答</button>
        ${q.is_follow_up
          ? '<button class="secondary" id="iv-skip">跳过追问</button>' : ""}
        <button class="secondary" id="iv-undo">撤销上一条</button>
        <span class="grow"></span>
        <span class="muted">${DVMarkdown.esc(tierLabel(q))}</span>
      </div>
      <div class="error-text" id="iv-q-err"></div>`;

    const optBox = card.querySelector("#iv-options");
    (q.options || []).forEach((opt) => {
      const div = document.createElement("div");
      div.className = "option" + (multi ? " multi" : "");
      div.innerHTML = `<span class="mark"></span><span>${DVMarkdown.esc(opt)}</span>
        ${opt === q.ai_recommendation ? '<span class="badge info">AI 推荐</span>' : ""}`;
      div.onclick = () => {
        if (multi) {
          if (selected.has(opt)) selected.delete(opt); else selected.add(opt);
        } else {
          selected = new Set([opt]);
        }
        optBox.querySelectorAll(".option").forEach((n, i) => {
          n.classList.toggle("selected", selected.has((q.options || [])[i]));
        });
      };
      optBox.appendChild(div);
    });

    const customToggle = card.querySelector("#iv-custom-toggle");
    if (customToggle) {
      customToggle.onclick = () => {
        const box = card.querySelector("#iv-custom-box");
        box.style.display = box.style.display === "none" ? "block" : "none";
        if (box.style.display === "block") box.querySelector("textarea").focus();
      };
    }

    // draft persistence across reloads (reference keeps unsent answer
    // state client-side so a refresh mid-question loses nothing)
    const draftKey = `dv-draft-${sessionId}`;
    try {
      const draft = JSON.parse(localStorage.getItem(draftKey) || "null");
      if (draft && draft.question === q.question) {
        selected = new Set(draft.picked || []);
        optBox.querySelectorAll(".option").forEach((n, i) => {
          n.classList.toggle("selected", selected.has((q.options || [])[i]));
        });
        if (draft.reason) card.querySelector("#iv-reason").value = draft.reason;
        if (draft.custom && card.querySelector("#iv-custom")) {
          card.querySelector("#iv-custom-box").style.display = "block";
          card.querySelector("#iv-custom").value = draft.custom;
        }
      }
    } catch (e) { /* corrupted draft is ignorable */ }
    const saveDraft = () => {
      try {
        localStorage.setItem(draftKey, JSON.stringify({
          question: q.question,
          picked: Array.from(selected),
          reason: (card.querySelector("#iv-reason") || {}).value || "",
          custom: (card.querySelector("#iv-custom") || {}).value || "",
        }));
      } catch (e) { /* quota/private mode */ }
    };
    card.addEventListener("click", saveDraft);
    card.addEventListener("input", saveDraft);

    card.querySelector("#iv-submit").onclick = () => submitAnswer(q);
    const skip = card.querySelector("#iv-skip");
    if (skip) skip.onclick = async () => {
      await DVApi.post(`/api/sessions/${sessionId}/skip-follow-up`, {});
      await refreshSession();
      nextQuestion();
    };
    card.querySelector("#iv-undo").onclick = async () => {
      try {
        await DVApi.post(`/api/sessions/${sessionId}/undo-answer`, {});
        await refreshSession();
        nextQuestion();
      } catch (e) { DV.toast(e.message, "err"); }
    };
  }

  function tierLabel(q) {
    const t = q.question_generation_tier;
    if (!t) return "";
    return { fast: "⚡ 快速通道", full: "完整生成", fallback: "规则降级" }[t] || t;
  }

  async function submitAnswer(q) {
    const err = root.querySelector("#iv-q-err");
    const reason = (root.querySelector("#iv-reason") || {}).value || "";
    const custom = ((root.querySelector("#iv-custom") || {}).value || "").trim();
    const picked = Array.from(selected);
    let answer = custom || picked.join("；");
    if (!answer && reason) answer = reason;
    if (!answer) { err.textContent = "请选择选项或填写回答"; return; }
    if (q.answer_mode === "pick_with_reason" && q.requires_rationale &&
        !reason.trim()) {
      err.textContent = "该问题需要补充说明理由";
      return;
    }
    const btn = root.querySelector("#iv-submit");
    btn.disabled = true;
    try {
      try { localStorage.removeItem(`dv-draft-${sessionId}`); } catch (e) {}
      await DVApi.post(`/api/sessions/${sessionId}/submit-answer`, {
        question: q.question,
        answer,
        dimension: q.dimension,
        is_follow_up: q.is_follow_up,
        options: q.options,
        multi_select: q.multi_select,
        answer_mode: q.answer_mode,
        requires_rationale: q.requires_rationale,
        evidence_intent: q.evidence_intent,
        rationale_text: reason,
      });
      await refreshSession();
      nextQuestion();
    } catch (e) {
      err.textContent = e.message;
      btn.disabled = false;
    }
  }

  // ---- report generation (readiness gate + stage machine poll) -------
  async function generateReport() {
    let readiness = null;
    try {
      readiness = (await DVApi.get(
        `/api/sessions/${sessionId}/report-readiness`)).body;
    } catch (e) { /* readiness optional */ }
    if (readiness && readiness.ready === false &&
        (readiness.blockers || []).length) {
      const blockers = readiness.blockers.map((b) =>
        `<li>${DVMarkdown.esc(b.detail || b.type)}</li>`).join("");
      const m = DV.modal(`
        <h2>报告条件未满足</h2>
        <ul>${blockers}</ul>
        <div class="row">
          <button class="secondary" id="rr-continue">继续访谈</button>
          <button id="rr-force">仍然生成</button>
        </div>`);
      m.querySelector("#rr-continue").onclick = () => DV.closeModal();
      m.querySelector("#rr-force").onclick = () => {
        DV.closeModal();
        submitReport(true);
      };
      return;
    }
    submitReport(false);
  }

  async function submitReport(force) {
    try {
      await DVApi.post(`/api/sessions/${sessionId}/generate-report`,
        { force });
    } catch (e) {
      DV.toast(e.message, "err");
      return;
    }
    const m = DV.modal(`
      <h2>正在生成报告</h2>
      <div class="progress-track"><div class="progress-bar" id="rp-bar"
        style="width:4%"></div></div>
      <p class="muted" id="rp-msg">已提交…</p>
      <button class="secondary small" id="rp-bg">后台运行</button>`);
    m.querySelector("#rp-bg").onclick = () => DV.closeModal();
    const timer = setInterval(async () => {
      try {
        const { body: st } = await DVApi.get(
          `/api/status/report-generation/${sessionId}`);
        const bar = document.getElementById("rp-bar");
        const msg = document.getElementById("rp-msg");
        if (bar) bar.style.width = `${Math.round((st.progress || 0) * 100)}%`;
        if (msg) {
          msg.textContent = `${st.stage_label || st.state} — ${st.message || ""}` +
            (st.queue_position ? `（队列第 ${st.queue_position} 位）` : "");
        }
        if (st.state === "completed") {
          clearInterval(timer);
          DV.closeModal();
          DV.toast("报告已生成", "ok");
          DV.show("report", st.report_name);
        } else if (st.state === "failed") {
          clearInterval(timer);
          if (msg) msg.textContent = `失败：${st.error || "未知错误"}`;
        }
      } catch (e) { /* poll transient errors */ }
    }, 2000);
  }

  // ---- documents -----------------------------------------------------
  function showDocs() {
    const docs = session.reference_materials || [];
    const m = DV.modal(`
      <h2>参考资料</h2>
      <div id="doc-list">${docs.length ? "" : '<p class="muted">尚未上传文档</p>'}</div>
      <input type="file" id="doc-file"
        accept=".pdf,.docx,.xlsx,.pptx,.md,.txt,.csv,.png,.jpg,.jpeg">
      <div class="error-text" id="doc-err"></div>
      <div class="row" style="margin-top:10px">
        <button id="doc-upload">上传</button>
      </div>`);
    const list = m.querySelector("#doc-list");
    docs.forEach((d) => {
      const chip = document.createElement("span");
      chip.className = "doc-chip";
      chip.innerHTML = `📄 ${DVMarkdown.esc(d.name || "")}
        <span class="muted">${d.summary ? "已摘要" : ""}</span>
        <button class="small ghost" style="color:var(--err)"
          title="删除">✕</button>`;
      chip.querySelector("button").onclick = async () => {
        if (!confirm(`删除文档「${d.name}」？`)) return;
        try {
          await DVApi.del(`/api/sessions/${sessionId}/documents/` +
            encodeURIComponent(d.name));
          DV.toast("已删除", "ok");
          await refreshSession();
          DV.closeModal();
          showDocs();
        } catch (e) { DV.toast(e.message, "err"); }
      };
      list.appendChild(chip);
    });
    m.querySelector("#doc-upload").onclick = async () => {
      const f = m.querySelector("#doc-file").files[0];
      const err = m.querySelector("#doc-err");
      if (!f) { err.textContent = "请选择文件"; return; }
      const fd = new FormData();
      fd.append("file", f);
      try {
        await DVApi.upload(`/api/sessions/${sessionId}/documents`, fd);
        DV.toast("上传成功，正在转换与摘要", "ok");
        await refreshSession();
        DV.closeModal();
      } catch (e) { err.textContent = e.message; }
    };
  }

  // ---- assistant chat --------------------------------------------------
  function showChat() {
    const m = DV.modal(`
      <h2>访谈助手</h2>
      <div id="chat-log" style="max-height:280px;overflow:auto"></div>
      <textarea id="chat-input" rows="2"
        placeholder="对当前问题有疑问？让助手帮你梳理…"></textarea>
      <div class="row"><button id="chat-send">发送</button></div>`);
    m.querySelector("#chat-send").onclick = async () => {
      const input = m.querySelector("#chat-input");
      const text = input.value.trim();
      if (!text) return;
      const log = m.querySelector("#chat-log");
      log.innerHTML += `<div class="qa"><div class="q">${DVMarkdown.esc(text)}</div></div>`;
      input.value = "";
      try {
        const { body } = await DVApi.post(
          `/api/sessions/${sessionId}/interview-assistant-chat`,
          { message: text,
            question: current ? current.question : "",
            options: current ? current.options : [] });
        const sug = body.suggested_answer;
        log.innerHTML += `<div class="qa"><div class="a">${
          DVMarkdown.esc(body.reply || "")}</div>${
          sug && sug.option
            ? `<span class="badge info">建议：${DVMarkdown.esc(sug.option)}</span>`
            : ""}</div>`;
        log.scrollTop = log.scrollHeight;
      } catch (e) { DV.toast(e.message, "err"); }
    };
  }

  DV.registerView("interview", { mount, unmount });
})();
