"""Interview assistant chat: in-interview helper with suggestion mapping.

Re-implements the reference assistant (interview_assistant_chat.py:588/236/
414 — context assembly from recent Q/A + doc chunks, suggested-answer
extraction mapped back onto the current question's options)."""

from __future__ import annotations

import re
from typing import List, Optional

from deepvision_tpu.web.runtime.documents import select_chunks_for_query


def build_chat_context(session: dict, user_message: str,
                       max_history: int = 5) -> str:
    parts = [f"访谈主题：{session.get('topic', '')}"]
    log = session.get("interview_log", [])
    if log:
        recent = log[-max_history:]
        parts.append("最近问答：")
        for e in recent:
            parts.append(f"问：{e.get('question')}\n答：{e.get('answer')}")
    chunks: List[str] = []
    for doc in session.get("reference_materials", []):
        chunks.extend(doc.get("chunks") or [])
    if chunks:
        relevant = select_chunks_for_query(chunks, user_message, top_k=2)
        if relevant:
            parts.append("相关文档片段：\n" + "\n---\n".join(relevant))
    return "\n\n".join(parts)


def extract_suggested_answer(reply: str,
                             options: Optional[List[str]]) -> Optional[dict]:
    """Map the assistant's advice back onto the current question's options
    (reference suggestion extraction interview_assistant_chat.py:414)."""
    if not options:
        return None
    for opt in options:
        if opt and opt in reply:
            return {"option": opt, "source": "mentioned"}
    m = re.search(r"选择[\"“]?([^\"”，。]+)", reply)
    if m:
        cand = m.group(1).strip()
        for opt in options:
            if cand in opt or opt in cand:
                return {"option": opt, "source": "inferred"}
    return None


class AssistantChat:
    def __init__(self, gateway):
        self.gateway = gateway

    def chat(self, session: dict, user_message: str,
             current_question: Optional[dict] = None) -> dict:
        context = build_chat_context(session, user_message)
        prompt = (
            "你是访谈助手，帮助受访者理解并回答当前问题。结合上下文给出"
            "简明建议（不超过200字）。\n\n" + context
            + f"\n\n用户提问：{user_message}"
        )
        if current_question:
            prompt += f"\n当前问题：{current_question.get('question')}"
            if current_question.get("options"):
                prompt += f"\n选项：{'、'.join(current_question['options'])}"
        try:
            reply = self.gateway.call_model(
                prompt, call_type="chat",
                context={"topic": session.get("topic", "")},
            )
        except Exception:
            reply = ("建议结合实际业务场景回答：先说明现状，再描述期望的"
                     "改进方向。")
        suggestion = extract_suggested_answer(
            reply, (current_question or {}).get("options")
        )
        return {"reply": reply, "suggested_answer": suggestion}
