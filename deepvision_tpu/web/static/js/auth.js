/* Auth + license UI state: SMS login flow, account panel (bind phone /
   WeChat, account merge), license activation.
   Re-implements reference web/app_modules/auth_license_state.js. */
(function () {
  "use strict";

  let countdown = 0;
  let countdownTimer = null;

  function showLogin() {
    const m = DV.modal(`
      <h2>手机号登录</h2>
      <label class="field">手机号
        <input id="login-phone" placeholder="13800000000" autocomplete="tel">
      </label>
      <div class="row">
        <div class="grow">
          <label class="field">验证码
            <input id="login-code" placeholder="6位验证码" maxlength="6">
          </label>
        </div>
        <button class="secondary" id="send-code-btn" style="margin-top:14px">
          获取验证码</button>
      </div>
      <div class="error-text" id="login-err"></div>
      <div class="row" style="margin-top:14px">
        <button id="login-submit" class="grow">登录 / 注册</button>
      </div>
      <p class="muted">未注册的手机号将自动创建账号。</p>`);

    const err = m.querySelector("#login-err");
    const sendBtn = m.querySelector("#send-code-btn");

    sendBtn.onclick = async () => {
      const phone = m.querySelector("#login-phone").value.trim();
      if (!/^\+?\d{6,15}$/.test(phone)) {
        err.textContent = "手机号格式不正确";
        return;
      }
      err.textContent = "";
      try {
        await DVApi.post("/api/auth/sms/send-code", { phone });
        DV.toast("验证码已发送", "ok");
        countdown = 60;
        sendBtn.disabled = true;
        clearInterval(countdownTimer);
        countdownTimer = setInterval(() => {
          countdown--;
          sendBtn.textContent = countdown > 0 ? `${countdown}s` : "获取验证码";
          if (countdown <= 0) {
            sendBtn.disabled = false;
            clearInterval(countdownTimer);
          }
        }, 1000);
      } catch (e) {
        err.textContent = e.message;
      }
    };

    m.querySelector("#login-submit").onclick = async () => {
      const phone = m.querySelector("#login-phone").value.trim();
      const code = m.querySelector("#login-code").value.trim();
      if (!phone || !code) { err.textContent = "请填写手机号与验证码"; return; }
      try {
        await DVApi.post("/api/auth/login/code", { phone, code });
        await DV.refreshUser();
        DV.closeModal();
        DV.toast("登录成功", "ok");
        DV.show(DV.state.view || "sessions");
      } catch (e) {
        err.textContent = e.message;
      }
    };
  }

  // ---- account panel: bindings, merge, license ----------------------
  async function showAccount() {
    let bind = {};
    let lic = {};
    try { bind = (await DVApi.get("/api/auth/bind/status")).body; } catch (e) { /* ignore */ }
    try { lic = (await DVApi.get("/api/licenses/current")).body; } catch (e) { /* ignore */ }

    const licLine = lic.license
      ? `<span class="badge ok">已激活 · ${DVMarkdown.esc(lic.license.level || "")}</span>`
      : '<span class="badge">未激活</span>';

    const m = DV.modal(`
      <h2>账号与授权</h2>
      <h3>绑定状态</h3>
      <p>手机号：${bind.phone_bound ? '<span class="badge ok">已绑定</span>'
        : '<span class="badge warn">未绑定</span>'}
         &nbsp; 微信：${bind.wechat_bound
        ? `<span class="badge ok">已绑定 ${DVMarkdown.esc(bind.wechat_nickname || "")}</span>`
        : '<span class="badge">未绑定</span>'}</p>
      <div class="row">
        <button class="small secondary" id="bind-phone-btn">绑定/换绑手机号</button>
        <button class="small secondary" id="bind-wechat-btn">绑定微信</button>
      </div>
      <h3>授权 ${licLine}</h3>
      <div class="row">
        <div class="grow"><input id="lic-code" placeholder="输入激活码"></div>
        <button class="small" id="lic-activate">激活</button>
      </div>
      <div class="error-text" id="account-err"></div>
      <div id="merge-area"></div>`);

    const err = m.querySelector("#account-err");

    m.querySelector("#lic-activate").onclick = async () => {
      const code = m.querySelector("#lic-code").value.trim();
      if (!code) return;
      try {
        await DVApi.post("/api/licenses/activate", { code });
        DV.toast("激活成功", "ok");
        await DV.refreshUser();
        DV.closeModal();
      } catch (e) { err.textContent = e.message; }
    };

    m.querySelector("#bind-wechat-btn").onclick = async () => {
      try {
        const { body } = await DVApi.get("/api/auth/bind/wechat/start");
        if (body.url) window.open(body.url, "_blank");
      } catch (e) { err.textContent = e.message; }
    };

    m.querySelector("#bind-phone-btn").onclick = () => showBindPhone(m);
  }

  function showBindPhone(parentModal) {
    const m = DV.modal(`
      <h2>绑定手机号</h2>
      <label class="field">手机号 <input id="bp-phone"></label>
      <div class="row">
        <div class="grow"><input id="bp-code" placeholder="验证码"></div>
        <button class="secondary small" id="bp-send">获取验证码</button>
      </div>
      <div class="error-text" id="bp-err"></div>
      <div id="bp-merge"></div>
      <div class="row" style="margin-top:12px">
        <button id="bp-submit" class="grow">绑定</button>
      </div>`);
    const err = m.querySelector("#bp-err");
    m.querySelector("#bp-send").onclick = async () => {
      const phone = m.querySelector("#bp-phone").value.trim();
      try {
        await DVApi.post("/api/auth/sms/send-code", { phone });
        DV.toast("验证码已发送", "ok");
      } catch (e) { err.textContent = e.message; }
    };
    m.querySelector("#bp-submit").onclick = async () => {
      const phone = m.querySelector("#bp-phone").value.trim();
      const code = m.querySelector("#bp-code").value.trim();
      try {
        const { body } = await DVApi.post("/api/auth/bind/phone", { phone, code });
        if (body.conflict && body.merge_available) {
          renderMergeOffer(m.querySelector("#bp-merge"));
          return;
        }
        DV.toast("绑定成功", "ok");
        DV.closeModal();
      } catch (e) { err.textContent = e.message; }
    };
  }

  // Account merge flow: server-side verified candidate only (the backend
  // records the candidate when this user proves control of the
  // conflicting phone/WeChat; preview shows masked summaries).
  async function renderMergeOffer(el) {
    el.innerHTML = `<p class="muted">该手机号已绑定其他账号。</p>
      <button class="small" id="merge-preview-btn">查看合并预览</button>`;
    el.querySelector("#merge-preview-btn").onclick = async () => {
      try {
        const { body } = await DVApi.post("/api/auth/account-merge/preview", {});
        const f = body.from_user || {};
        el.innerHTML = `
          <div class="card">
            <p>将把账号 <b>${DVMarkdown.esc(f.phone || String(f.user_id))}</b>
               （${DVMarkdown.esc(f.nickname || "")}）的微信身份并入当前账号。</p>
            <button class="small danger" id="merge-apply-btn">确认合并</button>
          </div>`;
        el.querySelector("#merge-apply-btn").onclick = async () => {
          await DVApi.post("/api/auth/account-merge/apply",
            { preview_token: body.preview_token });
          DV.toast("账号合并完成", "ok");
          DV.closeModal();
        };
      } catch (e) {
        el.innerHTML = `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
      }
    };
  }

  window.DVAuth = { showLogin, showAccount };
})();
